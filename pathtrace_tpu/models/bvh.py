"""BVH: host-side build, flattened device arrays, stackless traversal.

TPU re-design of the reference's arena BVH (reference
``src/collision/bvh.rs``):

* **Build** (host, numpy or the C++ builder in ``native/``): the same
  random-axis median-split strategy (``bvh.rs:268-333``) — sort by AABB min
  on a randomly chosen axis, split at the median, recurse; leaves hold one
  primitive.
* **Flatten**: nodes are laid out in DFS pre-order with an *escape index*
  (where to jump on AABB miss). This replaces recursion
  (``bvh.rs:37-62``) with a pointer-chase loop a fixed-shape wavefront
  program can run: no stack, one ``int32`` cursor per ray.
* **Traverse** (device, jnp): all rays advance their cursors in lock-step
  under a bounded ``while_loop``; each step is a gather of one node per ray,
  a slab test against the *current best t* (the traversal analog of the
  recursion's shrinking ``t_max``), and a leaf primitive test.

On TPU this is latency/divergence-bound and loses to the brute-force
``[R x N]`` kernel for the reference's ~500-sphere scenes — which is exactly
why the reference makes the BVH optional behind ``-B`` (``src/main.rs:63-66``)
and why brute force is our default too. The BVH exists for capability parity
and for scenes orders of magnitude larger.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.models.types import Spheres

_INF = float(MAX_T)


@dataclasses.dataclass
class FlatBVH:
    """Flattened BVH in DFS pre-order with escape indices (a pytree)."""

    bb_min: np.ndarray   # [M, 3]
    bb_max: np.ndarray   # [M, 3]
    escape: np.ndarray   # [M] i32 — next node on miss (M = end)
    prim: np.ndarray     # [M] i32 — primitive id at leaf, -1 for inner

    @property
    def n_nodes(self) -> int:
        return self.bb_min.shape[0]


jax.tree_util.register_pytree_node(
    FlatBVH,
    lambda b: ((b.bb_min, b.bb_max, b.escape, b.prim), None),
    lambda _, ch: FlatBVH(*ch),
)


@dataclasses.dataclass
class BVHStats:
    """Build census (analog of reference BVHStats, bvh.rs:11-21)."""

    node_count: int
    leaf_count: int
    max_depth: int


def sphere_aabbs(spheres: Spheres, t0: float = 0.0, t1: float = 1.0):
    """Per-sphere AABBs, motion-expanded (reference moving_sphere.rs:76-89).

    Negative radii get |r| boxes (the reference's centre±r with r<0 yields an
    inverted box, min>max — a quirk we correct; SURVEY.md notes the same
    class of issue at rect.rs:225).
    """
    c = np.asarray(spheres.center, np.float64)
    d = np.asarray(spheres.center_delta, np.float64)
    r = np.abs(np.asarray(spheres.radius, np.float64))[:, None]
    c0 = c
    c1 = c + d  # center at time1
    mn = np.minimum(c0 - r, c1 - r)
    mx = np.maximum(c0 + r, c1 + r)
    return mn.astype(np.float32), mx.astype(np.float32)


def build_flat_bvh(
    bb_min: np.ndarray,
    bb_max: np.ndarray,
    mask: Optional[np.ndarray] = None,
    seed: int = 0,
    use_native: bool = True,
) -> Tuple[FlatBVH, BVHStats]:
    """Build + flatten a BVH over the given primitive AABBs.

    Uses the C++ builder from ``native/`` when available, else numpy.
    """
    ids = np.arange(bb_min.shape[0], dtype=np.int32)
    if mask is not None:
        ids = ids[np.asarray(mask)]
    if ids.size == 0:
        raise ValueError("cannot build BVH over empty primitive set")

    if use_native:
        try:
            from pathtrace_tpu.utils.native import native_build_bvh

            out = native_build_bvh(bb_min, bb_max, ids, seed)
            if out is not None:
                return out
        except ImportError:
            pass
    return _build_numpy(bb_min, bb_max, ids, seed)


def _build_numpy(bb_min, bb_max, ids, seed) -> Tuple[FlatBVH, BVHStats]:
    rng = np.random.default_rng(seed)
    nodes_min, nodes_max, nodes_prim = [], [], []
    children = []  # (left_child_node, subtree_size) bookkeeping via recursion
    stats = BVHStats(node_count=0, leaf_count=0, max_depth=0)

    def emit(mn, mx, prim):
        nodes_min.append(mn)
        nodes_max.append(mx)
        nodes_prim.append(prim)
        return len(nodes_prim) - 1

    def build(subset: np.ndarray, depth: int) -> int:
        """Emit subtree in DFS pre-order; returns subtree root index."""
        stats.max_depth = max(stats.max_depth, depth)
        mn = bb_min[subset].min(axis=0)
        mx = bb_max[subset].max(axis=0)
        if subset.size == 1:
            stats.leaf_count += 1
            return emit(mn, mx, int(subset[0]))
        # random-axis median split on AABB min (reference bvh.rs:268-281)
        axis = int(rng.integers(0, 3))
        order = np.argsort(bb_min[subset, axis], kind="stable")
        subset = subset[order]
        mid = subset.size // 2
        me = emit(mn, mx, -1)
        build(subset[:mid], depth + 1)
        build(subset[mid:], depth + 1)
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        build(ids.astype(np.int64), 1)
    finally:
        sys.setrecursionlimit(old_limit)

    M = len(nodes_prim)
    stats.node_count = M
    prim = np.asarray(nodes_prim, np.int32)
    # escape index: next node in pre-order whose subtree does not contain i.
    # computed from subtree extents via a stack replay
    escape = np.full(M, M, np.int32)
    # subtree size: leaf=1; inner = 1 + sizes of two children. Recover by
    # scanning: a node at i with prim>=0 has size 1; else its subtree is
    # [i, j) where j found by counting: walk with a stack.
    sizes = np.ones(M, np.int64)
    stack = []
    # compute sizes via reverse scan: children of inner nodes are contiguous
    # in pre-order; we rebuild sizes by simulating the recursion
    def compute_size(i: int) -> int:
        if prim[i] >= 0:
            sizes[i] = 1
            return 1
        left = i + 1
        ls = compute_size(left)
        rs = compute_size(left + ls)
        sizes[i] = 1 + ls + rs
        return int(sizes[i])

    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        compute_size(0)
    finally:
        sys.setrecursionlimit(old_limit)
    escape = (np.arange(M, dtype=np.int64) + sizes).astype(np.int32)

    flat = FlatBVH(
        bb_min=np.asarray(nodes_min, np.float32),
        bb_max=np.asarray(nodes_max, np.float32),
        escape=escape,
        prim=prim,
    )
    return flat, stats


def bvh_sphere_nearest(
    bvh: FlatBVH,
    spheres: Spheres,
    ro,
    rd,
    time,
    t_min=MIN_T,
    t_max=MAX_T,
    has_motion: bool = True,
):
    """Stackless wavefront BVH traversal for the sphere soup.

    Drop-in alternative to ``intersect.sphere_nearest`` (same signature
    contract), selected by ``Params.use_bvh`` — the ``-B`` flag analog.
    """
    n_nodes = bvh.n_nodes
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    spheres = jax.tree_util.tree_map(jnp.asarray, spheres)
    R = ro.shape[0]
    rcp = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)

    def sphere_test(pid, best_t, best_i):
        c0 = spheres.center[pid]
        if has_motion:
            s = (time - spheres.time0[pid]) * spheres.inv_time_delta[pid]
            c0 = c0 + s[..., None] * spheres.center_delta[pid]
        radius = spheres.radius[pid]
        oc = ro - c0
        a = jnp.sum(rd * rd, axis=-1)
        b = jnp.sum(oc * rd, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        t0 = (-b - sq) / a
        t1 = (-b + sq) / a
        valid = (disc > 0.0) & spheres.mask[pid]
        t0_ok = valid & (t0 > t_min) & (t0 < best_t)
        t1_ok = valid & (t1 > t_min) & (t1 < best_t)
        t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, jnp.float32(_INF)))
        better = t < best_t
        return jnp.where(better, t, best_t), jnp.where(better, pid, best_i)

    def cond(state):
        cursor, best_t, best_i, it = state
        return jnp.any(cursor < n_nodes) & (it < 4 * n_nodes)

    def body(state):
        cursor, best_t, best_i, it = state
        active = cursor < n_nodes
        cur = jnp.minimum(cursor, n_nodes - 1)
        mn = bvh.bb_min[cur]                               # [R, 3]
        mx = bvh.bb_max[cur]
        prim = bvh.prim[cur]
        esc = bvh.escape[cur]

        # slab test vs the shrinking best_t (reference aabb.rs:46-58)
        d0 = (mn - ro) * rcp
        d1 = (mx - ro) * rcp
        tn = jnp.max(jnp.minimum(d0, d1), axis=-1)
        tf = jnp.min(jnp.maximum(d0, d1), axis=-1)
        box_hit = jnp.minimum(tf, best_t) > jnp.maximum(tn, t_min)

        is_leaf = prim >= 0
        do_test = active & box_hit & is_leaf
        pid = jnp.where(do_test, prim, 0)
        new_t, new_i = sphere_test(pid, best_t, best_i)
        best_t = jnp.where(do_test, new_t, best_t)
        best_i = jnp.where(do_test, new_i, best_i)

        descend = active & box_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, cur + 1, esc)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, best_t, best_i, it + 1

    init = (
        jnp.zeros(R, jnp.int32),
        jnp.full(R, t_max, jnp.float32),  # honor the caller's window
        jnp.zeros(R, jnp.int32),
        jnp.int32(0),
    )
    _, best_t, best_i, _ = jax.lax.while_loop(cond, body, init)
    # misses report MAX_T like sphere_nearest does
    best_t = jnp.where(best_t < t_max, best_t, jnp.float32(_INF))
    return best_t, best_i


def make_bvh_sphere_nearest(bvh: FlatBVH):
    """Bind a built BVH into the sphere_nearest_fn interface."""

    def fn(spheres, ro, rd, time, t_min=MIN_T, t_max=MAX_T, has_motion=True):
        return bvh_sphere_nearest(
            bvh, spheres, ro, rd, time, t_min, t_max, has_motion=has_motion
        )

    return fn
