"""Fused Pallas shading path: parity with the XLA shading path.

The fused kernel (ops/shade_pallas.py) mirrors ops/fastpath.fast_bounce
operation for operation. Exact bitwise equality between the two is not
achievable — XLA contracts mul+add chains into FMAs differently in the two
compiled graphs (~1-2 ULP drift on positions/directions) — so the contract
is: every lane agrees to ~ULP tolerance, except a tiny budget of lanes
whose *discrete* decisions (dielectric coin, metal horizon, hit-at-edge)
flipped on a ULP boundary and then legitimately diverged.

Within ONE path, determinism stays bitwise (see
test_fastpath.test_compaction_bit_exact_invariance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.camera import get_rays
from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import fastpath as fp
from pathtrace_tpu.ops.shade_pallas import fused_shade_supported


def camera_rays(cam, n, seed=0):
    key = jax.random.PRNGKey(seed)
    s = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return get_rays(cam, s, t, u)


def make_states(ro, rd, tm):
    R = ro.shape[0]
    legacy = fp.FastState(
        ro=ro, rd=rd, time=tm,
        radiance=jnp.zeros((R, 3)), throughput=jnp.ones((R, 3)),
        alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
    )
    planes = fp.FastStateP(
        rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
        rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
        rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
        thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
        alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
    )
    return legacy, planes


def assert_lanes_close(a, b, outlier_budget=0.005, rtol=1e-3, atol=1e-3):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    close = np.abs(a - b) <= atol + rtol * np.abs(b)
    frac_bad = 1.0 - close.mean()
    assert frac_bad <= outlier_budget, (
        f"{frac_bad:.4%} lanes beyond ULP tolerance "
        f"(max diff {np.abs(a - b).max()})"
    )


def assert_states_close(s1: fp.FastState, s2: fp.FastStateP):
    s1 = jax.tree_util.tree_map(np.asarray, s1)
    s2 = jax.tree_util.tree_map(np.asarray, s2)
    pairs = [
        (s1.ro[:, 0], s2.rox), (s1.ro[:, 1], s2.roy), (s1.ro[:, 2], s2.roz),
        (s1.rd[:, 0], s2.rdx), (s1.rd[:, 1], s2.rdy), (s1.rd[:, 2], s2.rdz),
        (s1.radiance[:, 0], s2.rad_r), (s1.radiance[:, 1], s2.rad_g),
        (s1.radiance[:, 2], s2.rad_b),
        (s1.throughput[:, 0], s2.thr_r), (s1.throughput[:, 1], s2.thr_g),
        (s1.throughput[:, 2], s2.thr_b),
    ]
    for a, b in pairs:
        assert_lanes_close(a, b)
    assert (s1.alive == s2.alive).mean() >= 0.995


# every fused-eligible scene class: plain lam/metal/diel spheres, noise
# textures, emissive + black sky, moving spheres + checker, rect/box
# cornell, constant-density media, sphere-walled smallpt
FUSED_PRESETS = ["small", "two_perlin_spheres", "simple_light", "random",
                 "cornell", "cornell_smoke", "smallpt"]


class TestFusedParity:
    @pytest.mark.parametrize("preset", FUSED_PRESETS)
    def test_bounce_chain_matches_xla(self, preset):
        scene, cam = presets.from_name(preset, aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        assert fused_shade_supported(feats)
        tables, sky, gsky = fp.prep_tables(scene, feats)
        ro, rd, tm = camera_rays(cam, 1024)
        s1, s2 = make_states(ro, rd, tm)
        seed = jnp.int32(11)
        for depth in range(3):
            s1 = fp.fast_bounce(tables, sky, gsky, s1, seed,
                                jnp.int32(depth), 8, feats, scene=scene)
            s2 = fp.fast_bounce_fused(tables, sky, gsky, s2, seed,
                                      jnp.int32(depth), 8, feats, scene=scene)
            assert_states_close(s1, s2)

    def test_image_scene_kernel_matches_xla(self):
        """The fused kernel's image-texture path (img_planes from the
        XLA UV + atlas-gather pre-pass): bit-level mirror of fast_bounce's
        image branch. Since r5 this IS the default route for sphere/rect
        image scenes (the plane-form pre-pass + hoisted [3, N] atlas made
        it the measured winner — tools/earth_probe.py)."""
        scene, cam = presets.from_name("earth", aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        assert fused_shade_supported(feats)  # image scenes go fused now
        tables, sky, gsky = fp.prep_tables(scene, feats)
        ro, rd, tm = camera_rays(cam, 1024)
        s1, s2 = make_states(ro, rd, tm)
        seed = jnp.int32(13)
        prims = fp._scene_prims(scene, feats)
        atlas = fp._atlas_planes(scene)
        for depth in range(3):
            s1 = fp.fast_bounce(tables, sky, gsky, s1, seed,
                                jnp.int32(depth), 8, feats, scene=scene)
            s2 = fp._fast_bounce_fused_prims(
                tables, sky, gsky, s2, seed, jnp.int32(depth), 8, feats,
                prims, atlas=atlas,
            )
            assert_states_close(s1, s2)

    def test_trace_fast_pads_ragged_wavefronts(self):
        """Non-multiple-of-128 wavefronts are padded with born-dead lanes;
        each ray's result is unchanged (per-lane RNG, no cross-ray state)."""
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 1024)
        rad_a, _ = fp.trace_fast(scene, ro[:1000], rd[:1000], tm[:1000],
                                 3, 6, feats, compaction=False)
        assert rad_a.shape == (1000, 3)
        rad_b, _ = fp.trace_fast(scene, ro, rd, tm, 3, 6, feats,
                                 compaction=False)
        np.testing.assert_array_equal(np.asarray(rad_a),
                                      np.asarray(rad_b)[:1000])
