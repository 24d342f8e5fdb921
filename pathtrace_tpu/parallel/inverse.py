"""Differentiable inverse rendering: optimize scene parameters to match a
target image, data-parallel across a device mesh.

This is the BASELINE.json north-star "training loop": the forward pass is the
differentiable wavefront render (``trace_diff``), the loss is image MSE, and
scene-parameter gradients flow through hit points, normals, BSDFs and
textures. Ray/sample shards run per chip; the shard_map transpose inserts the
gradient all-reduce over ICI automatically (the ``psum`` of replicated-input
cotangents) — overlapped by XLA with the backward sweep.

Optimizable leaves (by default): sphere centers/radii, texture colors,
material fuzz/IOR, Perlin gradients. Integer ids, masks and topology stay
fixed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pathtrace_tpu.camera import Camera
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.parallel import mesh as pmesh


# default trainable leaf selector: (path string) -> bool
def default_trainable(path: str) -> bool:
    return any(
        s in path
        for s in (
            "spheres.center",
            "spheres.radius",
            "textures.color",
            "materials.fuzz",
            "materials.ref_idx",
        )
    )


def _leaf_paths(scene: Scene):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(scene)
    paths = [
        ".".join(
            str(getattr(k, "name", getattr(k, "idx", k))) for k in path
        )
        for path, _ in leaves
    ]
    return paths, [leaf for _, leaf in leaves], treedef


def split_scene(scene: Scene, trainable: Callable[[str], bool] = default_trainable):
    """Split a scene into (trainable params pytree-list, rebuild closure)."""
    paths, leaves, treedef = _leaf_paths(scene)
    train_idx = [i for i, p in enumerate(paths) if trainable(p)]
    params = [leaves[i] for i in train_idx]
    frozen = list(leaves)

    def rebuild(params_list):
        merged = list(frozen)
        for slot, i in enumerate(train_idx):
            merged[i] = params_list[slot]
        return jax.tree_util.tree_unflatten(treedef, merged)

    names = [paths[i] for i in train_idx]
    return params, rebuild, names


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(eq=False)  # id-hashable: instances are static under jit
class InverseRenderer:
    """Inverse-rendering problem bound to a camera/film/mesh configuration."""

    camera: Camera
    width: int
    height: int
    samples: int
    max_depth: int
    mesh: Any  # jax.sharding.Mesh
    features: SceneFeatures
    rebuild: Callable[[Any], Scene]
    optimizer: Any = None
    learning_rate: float = 2e-2
    use_fast_path: bool = False  # mesh-sharded trace_fast_diff forward
    # visibility gradients: add the silhouette edge-sampling boundary term
    # (ops/silhouette.py) for sphere centers/radii; interior autodiff alone
    # sees zero gradient from pure occlusion changes
    silhouette: bool = False
    silhouette_samples: int = 128
    param_names: Tuple[str, ...] = ()

    def __post_init__(self):
        if self.optimizer is None:
            self.optimizer = optax.adam(self.learning_rate)

    def render(self, params, key):
        scene = self.rebuild(params)
        if self.use_fast_path:
            # differentiable fast path (custom-VJP Pallas hit kernel +
            # row-gather shading), sharded over the mesh: trace_fast_diff
            # runs in every shard and the shard_map transpose all-reduces
            # the scene-parameter gradients over ICI (the north-star
            # "gradient all-reduce overlapped with the backward sweep").
            # derive the counter-hash seed from the key so different keys
            # give independent bounce-RNG streams
            seed = jax.random.randint(
                jax.random.fold_in(key, 7), (), 0, 2**31 - 1,
                dtype=jnp.int32,
            )
            img, _ = pmesh.render_frame_sharded(
                scene, self.camera, self.width, self.height, self.samples,
                self.max_depth, key, self.mesh, features=self.features,
                differentiable=True, mode="fast", seed=seed,
            )
            return img
        img, _ = pmesh.render_frame_sharded(
            scene, self.camera, self.width, self.height, self.samples,
            self.max_depth, key, self.mesh, features=self.features,
            differentiable=True,
        )
        return img

    def loss(self, params, target, key):
        return self._loss_aux(params, target, key)[0]

    def _loss_aux(self, params, target, key):
        """(mse, rendered image) — the aux lets train_step reuse the
        forward image for the silhouette term instead of re-rendering."""
        img = self.render(params, key)
        return jnp.mean((img - target) ** 2), img

    def init(self, params) -> TrainState:
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.int32(0),
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, target, key) -> Tuple[TrainState, jnp.ndarray]:
        """One optimization step: differentiable sharded render -> MSE ->
        grads (all-reduced across the mesh by the shard_map transpose) ->
        adam update."""
        (loss_val, img), grads = jax.value_and_grad(
            self._loss_aux, has_aux=True
        )(state.params, target, key)
        if self.silhouette:
            grads = self._add_silhouette_grads(
                grads, state.params, target, key, img
            )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    def _add_silhouette_grads(self, grads, params, target, key, img):
        """Add the visibility boundary term to the interior gradients.

        ``img`` is the forward render already computed by value_and_grad's
        primal pass (via the aux) — no second render.
        """
        from pathtrace_tpu.ops.silhouette import silhouette_grads_all

        scene = self.rebuild(params)
        grad_img = 2.0 * (img - target) / img.size
        terms = silhouette_grads_all(
            scene, self.camera, self.width, self.height, grad_img,
            jax.random.fold_in(key, 0x51), max_depth=self.max_depth,
            features=self.features, n_samples=self.silhouette_samples,
        )
        out = list(grads)
        for i, name in enumerate(self.param_names):
            if name in terms:
                out[i] = out[i] + terms[name]
        return type(grads)(out) if not isinstance(grads, list) else out


def make_inverse_renderer(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples: int = 4,
    max_depth: int = 4,
    mesh=None,
    trainable: Callable[[str], bool] = default_trainable,
    learning_rate: float = 2e-2,
    use_fast_path: Optional[bool] = None,
    silhouette: bool = False,
    silhouette_samples: int = 128,
):
    """Build (renderer, initial TrainState, trainable-leaf names).

    ``use_fast_path=None`` (auto) trains on the sharded differentiable
    fast path whenever the scene class supports it, falling back to the
    general integrator otherwise.
    """
    mesh = mesh or pmesh.make_render_mesh()
    features = SceneFeatures.from_scene(scene)
    if use_fast_path is None:
        from pathtrace_tpu.ops.fastpath import fastpath_supported

        use_fast_path = fastpath_supported(features, scene)
    params, rebuild, names = split_scene(scene, trainable)
    renderer = InverseRenderer(
        camera=camera,
        width=width,
        height=height,
        samples=samples,
        max_depth=max_depth,
        mesh=mesh,
        features=features,
        rebuild=rebuild,
        learning_rate=learning_rate,
        use_fast_path=use_fast_path,
        silhouette=silhouette,
        silhouette_samples=silhouette_samples,
        param_names=tuple(names),
    )
    return renderer, renderer.init(params), names
