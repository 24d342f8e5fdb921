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
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.models.types import MEDIUM_SPHERE, Scene, SceneFeatures, Spheres

_INF = float(MAX_T)

# Straggler-slicing knobs (see bvh_scene_nearest): bulk lock-step
# iterations before the unfinished-first partition, and slice count for
# the tail phase. Swept on-device by tools/bvh_probe.py.
_BULK_IT = 24
_SLICE_N = 16


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
    if spheres.world_from_obj is not None:
        # generic instances: object-space box transformed to world
        # (reference aabb.rs:75-100 via Instance::bounding_box)
        return _transform_aabb(spheres.world_from_obj, mn, mx)
    return mn.astype(np.float32), mx.astype(np.float32)


def build_flat_bvh(
    bb_min: np.ndarray,
    bb_max: np.ndarray,
    mask: Optional[np.ndarray] = None,
    seed: int = 0,
    use_native: bool = True,
    strategy: str = "median",
) -> Tuple[FlatBVH, BVHStats]:
    """Build + flatten a BVH over the given primitive AABBs.

    Uses the C++ builder from ``native/`` when available, else numpy.

    ``strategy``: "median" = the reference's random-axis median split
    (``bvh.rs:268-333``); "sah" = full-sweep surface-area heuristic over
    all three axes. SAH trees cut traversal step counts ~35-55% on this
    scene family (camera rays 40.7 -> 26.2 mean visits, scattered bounce
    rays 22.3 -> 10.2 — measured by simulation, r4) at identical winners;
    build cost is host-side and one-time.
    """
    ids = np.arange(bb_min.shape[0], dtype=np.int32)
    if mask is not None:
        ids = ids[np.asarray(mask)]
    if ids.size == 0:
        raise ValueError("cannot build BVH over empty primitive set")

    if use_native:
        try:
            from pathtrace_tpu.utils.native import native_build_bvh

            out = native_build_bvh(bb_min, bb_max, ids, seed,
                                   strategy=strategy)
            if out is not None:
                return out
        except ImportError:
            pass
    if strategy == "sah":
        return _build_numpy_sah(bb_min, bb_max, ids)
    return _build_numpy(bb_min, bb_max, ids, seed)


def _build_numpy_sah(bb_min, bb_max, ids) -> Tuple[FlatBVH, BVHStats]:
    """Full-sweep SAH build: per node, try all 3 axes sorted by centroid,
    pick the split minimizing area_L*n_L + area_R*n_R."""
    cent = (bb_min + bb_max) * 0.5
    nodes_min, nodes_max, nodes_prim = [], [], []
    stats = BVHStats(node_count=0, leaf_count=0, max_depth=0)

    def emit(mn, mx, prim):
        nodes_min.append(mn)
        nodes_max.append(mx)
        nodes_prim.append(prim)
        return len(nodes_prim) - 1

    def half_area(mns, mxs):
        d = np.maximum(mxs - mns, 0.0)
        return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]

    def build(subset: np.ndarray, depth: int):
        stats.max_depth = max(stats.max_depth, depth)
        mn = bb_min[subset].min(axis=0)
        mx = bb_max[subset].max(axis=0)
        if subset.size == 1:
            stats.leaf_count += 1
            return emit(mn, mx, int(subset[0]))
        if depth >= 64:
            # depth guard (mirrors the C++ builder): lopsided SAH splits
            # can't recurse unboundedly
            order = np.argsort(cent[subset, 0], kind="stable")
            s = subset[order]
            me = emit(mn, mx, -1)
            build(s[: s.size // 2], depth + 1)
            build(s[s.size // 2:], depth + 1)
            return me
        best = None
        for ax in range(3):
            order = np.argsort(cent[subset, ax], kind="stable")
            s = subset[order]
            pm = np.minimum.accumulate(bb_min[s], 0)
            px = np.maximum.accumulate(bb_max[s], 0)
            sm = np.minimum.accumulate(bb_min[s][::-1], 0)[::-1]
            sx = np.maximum.accumulate(bb_max[s][::-1], 0)[::-1]
            a_l = half_area(pm, px)
            a_r = half_area(sm, sx)
            k = np.arange(1, s.size, dtype=np.float64)
            cost = a_l[:-1] * k + a_r[1:] * (s.size - k)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (float(cost[j]), s, j + 1)
        _, s, midp = best
        me = emit(mn, mx, -1)
        build(s[:midp], depth + 1)
        build(s[midp:], depth + 1)
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        build(ids.astype(np.int64), 1)
    finally:
        sys.setrecursionlimit(old_limit)

    M = len(nodes_prim)
    stats.node_count = M
    prim = np.asarray(nodes_prim, np.int32)
    sizes = np.ones(M, np.int64)

    def compute_size(i: int) -> int:
        if prim[i] >= 0:
            return 1
        left = i + 1
        ls = compute_size(left)
        rs = compute_size(left + ls)
        sizes[i] = 1 + ls + rs
        return int(sizes[i])

    sys.setrecursionlimit(max(old_limit, 100000))
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
    assert spheres.world_from_obj is None, (
        "instanced spheres traverse via bvh_scene_nearest's object-space "
        "leaf branch"
    )
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


# ---------------------------------------------------------------------------
# Whole-scene BVH: every primitive kind in one tree
# ---------------------------------------------------------------------------
#
# The reference BVH wraps *arbitrary* hitables — ``BVHNode::ray_hit``
# recurses into whatever children it was built over (reference
# ``src/collision/bvh.rs:37-62``), so ``-B`` accelerates cornell's rects and
# cuboids too. The TPU analog: one flat tree over the concatenation of every
# kind's AABBs, leaves tagged with a *global* primitive id (kind blocks laid
# out sphere | rect | box | medium, matching the fastpath table order), and a
# leaf test that dispatches on the id's block.


def rect_aabbs(rects):
    """Per-rect AABBs, ±1e-4 thick along the normal axis (reference
    ``src/collision/rect.rs:193-228``; the YZ ``k-0.0001`` max bug is
    corrected — SURVEY.md §2)."""
    n = rects.count
    axis = np.asarray(rects.axis)
    a_axis = np.where(axis == 0, 1, 0)
    b_axis = np.where(axis == 2, 1, 2)
    mn = np.zeros((n, 3), np.float64)
    mx = np.zeros((n, 3), np.float64)
    rows = np.arange(n)
    mn[rows, axis] = np.asarray(rects.k) - 1e-4
    mx[rows, axis] = np.asarray(rects.k) + 1e-4
    mn[rows, a_axis] = np.asarray(rects.a0)
    mx[rows, a_axis] = np.asarray(rects.a1)
    mn[rows, b_axis] = np.asarray(rects.b0)
    mx[rows, b_axis] = np.asarray(rects.b1)
    if rects.world_from_obj is not None:
        return _transform_aabb(rects.world_from_obj, mn, mx)
    return mn.astype(np.float32), mx.astype(np.float32)


def _transform_aabb(world_from_obj, mn, mx):
    """Affine-transform object AABBs to world space per-axis (reference
    ``src/collision/aabb.rs:75-100`` sign-select form)."""
    lin = np.asarray(world_from_obj)[:, :, :3]          # [N,3,3]
    trans = np.asarray(world_from_obj)[:, :, 3]         # [N,3]
    # for each output axis i: min/max over the 2 choices per input axis j
    lo = np.where(lin > 0, lin * mn[:, None, :], lin * mx[:, None, :]).sum(axis=2)
    hi = np.where(lin > 0, lin * mx[:, None, :], lin * mn[:, None, :]).sum(axis=2)
    return (lo + trans).astype(np.float32), (hi + trans).astype(np.float32)


def box_aabbs(boxes):
    mn = np.asarray(boxes.p0, np.float64)
    mx = np.asarray(boxes.p1, np.float64)
    return _transform_aabb(boxes.world_from_obj, mn, mx)


def media_aabbs(media):
    """Boundary AABBs: transformed box, or center±|r| for sphere media."""
    mn_b, mx_b = _transform_aabb(
        media.world_from_obj, np.asarray(media.p0, np.float64),
        np.asarray(media.p1, np.float64),
    )
    c = np.asarray(media.p0, np.float32)
    r = np.abs(np.asarray(media.radius, np.float32))[:, None]
    is_sph = (np.asarray(media.kind) == MEDIUM_SPHERE)[:, None]
    mn = np.where(is_sph, c - r, mn_b)
    mx = np.where(is_sph, c + r, mx_b)
    return mn, mx


def scene_aabbs(scene: Scene):
    """AABBs for every primitive in the scene, in global-id order.

    Returns (bb_min [P,3], bb_max [P,3], mask [P], offsets) where offsets =
    (sphere, rect, box, medium) block starts; global id = offset + local id.
    """
    s_mn, s_mx = sphere_aabbs(scene.spheres)
    r_mn, r_mx = rect_aabbs(scene.rects)
    b_mn, b_mx = box_aabbs(scene.boxes)
    m_mn, m_mx = media_aabbs(scene.media)
    mn = np.concatenate([s_mn, r_mn, b_mn, m_mn], axis=0)
    mx = np.concatenate([s_mx, r_mx, b_mx, m_mx], axis=0)
    mask = np.concatenate(
        [
            np.asarray(scene.spheres.mask),
            np.asarray(scene.rects.mask),
            np.asarray(scene.boxes.mask),
            np.asarray(scene.media.mask),
        ]
    )
    ns, nr, nb = s_mn.shape[0], r_mn.shape[0], b_mn.shape[0]
    offsets = (0, ns, ns + nr, ns + nr + nb)
    return mn, mx, mask, offsets


def build_scene_bvh(scene: Scene, seed: int = 0, use_native: bool = True,
                    strategy: str = "sah"):
    """Build the whole-scene BVH (all kinds). Returns (flat, stats, offsets).

    Defaults to the SAH builder: same winners as any tree over the same
    primitives, ~0.5x the traversal step count of the reference's
    random-axis median split (the build is host-side and one-time)."""
    mn, mx, mask, offsets = scene_aabbs(scene)
    flat, stats = build_flat_bvh(mn, mx, mask=mask, seed=seed,
                                 use_native=use_native, strategy=strategy)
    return flat, stats, offsets


def _leaf_candidate(scene, gid, offsets, features, ro, rd, time, med_u,
                    best_t, t_min):
    """Candidate hit t for one primitive per ray (gid is per-ray).

    Dispatches on the gid's kind block; each kind's math mirrors its
    brute-force ``*_nearest`` twin in :mod:`pathtrace_tpu.ops.intersect` so
    BVH and brute force select the same winners.
    """
    off_s, off_r, off_b, off_m = offsets
    INF = jnp.float32(_INF)
    cand = jnp.full(gid.shape, _INF, jnp.float32)

    if features.has_spheres:
        pid = jnp.clip(gid - off_s, 0, scene.spheres.count - 1)
        c0 = scene.spheres.center[pid]
        if features.has_motion:
            s = (time - scene.spheres.time0[pid]) * scene.spheres.inv_time_delta[pid]
            c0 = c0 + s[..., None] * scene.spheres.center_delta[pid]
        radius = scene.spheres.radius[pid]
        if scene.spheres.world_from_obj is not None:
            # generic instances: object-space ray, full quadratic
            # (|rd_o| != 1 under scaling) — mirrors sphere_nearest's branch
            ofw = scene.spheres.obj_from_world[pid]      # [R,3,4]
            ro_s = jnp.einsum("rij,rj->ri", ofw[:, :, :3], ro) + ofw[:, :, 3]
            rd_s = jnp.einsum("rij,rj->ri", ofw[:, :, :3], rd)
            a = jnp.sum(rd_s * rd_s, axis=-1)
        else:
            ro_s, rd_s = ro, rd
            a = 1.0                           # |rd| == 1 wavefront-wide
        oc = ro_s - c0
        b = jnp.sum(oc * rd_s, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        inv_a = 1.0 / a
        t0 = (-b - sq) * inv_a
        t1 = (-b + sq) * inv_a
        valid = (disc > 0.0) & scene.spheres.mask[pid]
        t0_ok = valid & (t0 > t_min) & (t0 < best_t)
        t1_ok = valid & (t1 > t_min) & (t1 < best_t)
        t_s = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, INF))
        cand = jnp.where(gid < off_r, t_s, cand)

    if features.has_rects:
        pid = jnp.clip(gid - off_r, 0, scene.rects.count - 1)
        if scene.rects.world_from_obj is not None:
            ofw = scene.rects.obj_from_world[pid]        # [R,3,4]
            ro_r = jnp.einsum("rij,rj->ri", ofw[:, :, :3], ro) + ofw[:, :, 3]
            rd_r = jnp.einsum("rij,rj->ri", ofw[:, :, :3], rd)
        else:
            ro_r, rd_r = ro, rd
        axis = scene.rects.axis[pid]
        a_axis = jnp.where(axis == 0, 1, 0)
        b_axis = jnp.where(axis == 2, 1, 2)
        ga = lambda arr, ax: jnp.take_along_axis(arr, ax[..., None], axis=-1)[..., 0]
        d_n = ga(rd_r, axis)
        d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
        t_r = (scene.rects.k[pid] - ga(ro_r, axis)) / d_n
        pa = ga(ro_r, a_axis) + t_r * ga(rd_r, a_axis)
        pb = ga(ro_r, b_axis) + t_r * ga(rd_r, b_axis)
        ok = (
            scene.rects.mask[pid]
            & (t_r > t_min) & (t_r < best_t)
            & (pa >= scene.rects.a0[pid]) & (pa <= scene.rects.a1[pid])
            & (pb >= scene.rects.b0[pid]) & (pb <= scene.rects.b1[pid])
        )
        t_r = jnp.where(ok, t_r, INF)
        cand = jnp.where((gid >= off_r) & (gid < off_b), t_r, cand)

    if features.has_boxes:
        pid = jnp.clip(gid - off_b, 0, scene.boxes.count - 1)
        ofw = scene.boxes.obj_from_world[pid]            # [R,3,4]
        ro_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], ro) + ofw[:, :, 3]
        rd_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], rd)
        rd_o = jnp.where(jnp.abs(rd_o) < 1e-12, 1e-12, rd_o)
        rcp = 1.0 / rd_o
        d0 = (scene.boxes.p0[pid] - ro_o) * rcp
        d1 = (scene.boxes.p1[pid] - ro_o) * rcp
        t_enter = jnp.max(jnp.minimum(d0, d1), axis=-1)
        t_exit = jnp.min(jnp.maximum(d0, d1), axis=-1)
        crosses = (t_exit > t_enter) & scene.boxes.mask[pid]
        enter_ok = crosses & (t_enter > t_min) & (t_enter < best_t)
        exit_ok = crosses & (t_enter <= t_min) & (t_exit > t_min) & (t_exit < best_t)
        t_b = jnp.where(enter_ok, t_enter, jnp.where(exit_ok, t_exit, INF))
        cand = jnp.where((gid >= off_b) & (gid < off_m), t_b, cand)

    if features.has_media:
        pid = jnp.clip(gid - off_m, 0, scene.media.count - 1)
        ofw = scene.media.obj_from_world[pid]
        ro_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], ro) + ofw[:, :, 3]
        rd_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], rd)
        rd_o = jnp.where(jnp.abs(rd_o) < 1e-12, 1e-12, rd_o)
        rcp = 1.0 / rd_o
        d0 = (scene.media.p0[pid] - ro_o) * rcp
        d1 = (scene.media.p1[pid] - ro_o) * rcp
        t1b = jnp.max(jnp.minimum(d0, d1), axis=-1)
        t2b = jnp.min(jnp.maximum(d0, d1), axis=-1)
        box_crosses = t2b > t1b
        # sphere boundary (centers in p0)
        oc = ro - scene.media.p0[pid]
        b = jnp.sum(oc * rd, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - scene.media.radius[pid] ** 2
        disc = b * b - c
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        is_sph = scene.media.kind[pid] == MEDIUM_SPHERE
        t1_ = jnp.where(is_sph, -b - sq, t1b)
        t2_ = jnp.where(is_sph, -b + sq, t2b)
        crosses = jnp.where(is_sph, disc > 0.0, box_crosses) & scene.media.mask[pid]
        # same clamping as media_nearest; comparing the candidate against
        # best_t afterwards is equivalent to the reference's shrinking t_max
        t1_ = jnp.maximum(t1_, t_min)
        ok = crosses & (t1_ < t2_)
        t1_ = jnp.maximum(t1_, 0.0)
        u = jnp.take_along_axis(med_u, pid[..., None], axis=-1)[..., 0]
        flight = -jnp.log(jnp.maximum(u, 1e-38)) / scene.media.density[pid]
        inside = flight < (t2_ - t1_)
        t_m = jnp.where(ok & inside & (t1_ + flight < best_t), t1_ + flight, INF)
        cand = jnp.where(gid >= off_m, t_m, cand)

    return cand


def bvh_scene_nearest(
    bvh: FlatBVH,
    scene: Scene,
    ro,
    rd,
    time,
    med_u,
    t_min=MIN_T,
    t_max=MAX_T,
    features: Optional[SceneFeatures] = None,
    offsets=(0, 0, 0, 0),
    bulk_it: Optional[int] = None,
):
    """Stackless wavefront traversal over the whole-scene BVH.

    Returns (t [R], gid [R]) with gid a *global* primitive id. Functional
    match of ``BVHNode::ray_hit`` over mixed hitables (reference
    ``src/collision/bvh.rs:37-62``) — same winners as the brute-force
    per-kind argmin combine in ``ops.intersect.intersect_scene``.
    """
    f = features or SceneFeatures.all_on()
    n_nodes = bvh.n_nodes
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    R = ro.shape[0]
    rcp = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)
    INF = jnp.float32(_INF)

    # Packed node rows: per traversal step the loop needs bbox (6), escape,
    # prim — and, for sphere leaves, the sphere itself. Separate per-plane
    # gathers cost ~13 ms/1M each on this device while a row gather of the
    # whole record costs ~6 ms/1M total (PERF.md), so everything rides ONE
    # [M, W] f32 array: int planes bitcast to f32 (bits survive the gather),
    # sphere leaf data inlined so the hot loop never touches scene arrays.
    esc_f = jax.lax.bitcast_convert_type(bvh.escape, jnp.float32)
    prim_f = jax.lax.bitcast_convert_type(bvh.prim, jnp.float32)
    off_s, off_r, off_b, off_m = offsets
    cols = [bvh.bb_min, bvh.bb_max, esc_f[:, None], prim_f[:, None]]
    # instanced spheres can't be inlined (the packed row carries world-space
    # quadratic inputs); they fall to _leaf_candidate's object-space branch
    inline_spheres = f.has_spheres and scene.spheres.world_from_obj is None
    if inline_spheres:
        sph = scene.spheres
        data = [sph.center, sph.radius[:, None]]
        if f.has_motion:
            data += [sph.center_delta, sph.time0[:, None],
                     sph.inv_time_delta[:, None]]
        sph_rows = jnp.concatenate(data, axis=1)           # [Ns, 4 or 9]
        ns = sph_rows.shape[0]
        lid = jnp.clip(bvh.prim - off_s, 0, ns - 1)
        is_sph_leaf = (bvh.prim >= 0) & (bvh.prim < off_r)
        cols.append(jnp.where(is_sph_leaf[:, None], sph_rows[lid], 0.0))
    pack = jnp.concatenate(cols, axis=1)                   # [M, W]

    # Non-sphere leaves are rare in sphere-heavy scenes; their (gathering)
    # leaf tests run under a lax.cond only on steps where some lane is at one.
    has_other = (f.has_rects or f.has_boxes or f.has_media
                 or (f.has_spheres and not inline_spheres))
    f_other = f
    if has_other and inline_spheres:
        kw = {k: getattr(f, k) for k in SceneFeatures.__slots__}
        kw["has_spheres"] = False
        f_other = SceneFeatures(**kw)

    def cond(state):
        cursor, best_t, best_i, it = state
        return jnp.any(cursor < n_nodes) & (it < 4 * n_nodes)

    def make_step(ro_s, rd_s, rcp_s, time_s, med_u_s):
        """One lock-step traversal step over the given ray set (any size)."""
        Rs = ro_s.shape[0]

        def body(state):
            cursor, best_t, best_i, it = state
            active = cursor < n_nodes
            cur = jnp.minimum(cursor, n_nodes - 1)
            row = pack[cur]                                # ONE row gather
            mn = row[:, 0:3]
            mx = row[:, 3:6]
            esc = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
            prim = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)

            d0 = (mn - ro_s) * rcp_s
            d1 = (mx - ro_s) * rcp_s
            tn = jnp.max(jnp.minimum(d0, d1), axis=-1)
            tf = jnp.min(jnp.maximum(d0, d1), axis=-1)
            box_hit = jnp.minimum(tf, best_t) > jnp.maximum(tn, t_min)

            is_leaf = prim >= 0
            do_test = active & box_hit & is_leaf
            gid = jnp.where(do_test, prim, 0)

            cand = jnp.full((Rs,), _INF, jnp.float32)
            if inline_spheres:
                # same math as _leaf_candidate's sphere branch, inputs from
                # the packed row — winners stay bit-identical to brute force
                c0 = row[:, 8:11]
                radius = row[:, 11]
                if f.has_motion:
                    s = (time_s - row[:, 15]) * row[:, 16]
                    c0 = c0 + s[..., None] * row[:, 12:15]
                oc = ro_s - c0
                b = jnp.sum(oc * rd_s, axis=-1)
                c = jnp.sum(oc * oc, axis=-1) - radius * radius
                disc = b * b - c
                sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
                tt0 = -b - sq
                tt1 = -b + sq
                valid = (disc > 0.0) & (gid < off_r)
                t0_ok = valid & (tt0 > t_min) & (tt0 < best_t)
                t1_ok = valid & (tt1 > t_min) & (tt1 < best_t)
                cand = jnp.where(t0_ok, tt0, jnp.where(t1_ok, tt1, INF))
            if has_other:
                def _other(_):
                    return _leaf_candidate(
                        scene, gid, offsets, f_other, ro_s, rd_s, time_s,
                        med_u_s, best_t, t_min,
                    )
                if inline_spheres:
                    cand_o = jax.lax.cond(
                        jnp.any(do_test & (gid >= off_r)), _other,
                        lambda _: jnp.full((Rs,), _INF, jnp.float32), 0,
                    )
                else:
                    cand_o = _other(0)
                cand = jnp.minimum(cand, cand_o)

            better = do_test & (cand < best_t)
            best_t = jnp.where(better, cand, best_t)
            best_i = jnp.where(better, gid, best_i)

            descend = active & box_hit & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, cur + 1, esc)
            cursor = jnp.where(active, nxt, cursor)
            return cursor, best_t, best_i, it + 1

        return body

    # (~100-step MAX paths vs ~12 MEAN on the cover scene — the straggler
    # slicing in _run_traversal amortizes the tail; bit-identical.)
    return _run_traversal(
        cond, make_step, ro, rd, rcp, time, med_u, R, n_nodes, t_max,
        need_med=(has_other and f.has_media),
        bulk_it=_BULK_IT if bulk_it is None else bulk_it,
        slice_n=_SLICE_N,
    )


# ---------------------------------------------------------------------------
# Wide-node BVH: parent-stored child boxes + multi-primitive leaves
# ---------------------------------------------------------------------------
#
# The flat escape-index tree above spends one full step (one [R, 17] row
# gather — the dominant per-step cost on this device) on EVERY node arrival,
# including arrivals that immediately miss the node's own box. The wide
# layout removes those wasted arrivals two ways:
#
# 1. **Child boxes live in the parent row.** A step at an inner node tests
#    BOTH children's slabs against the current best t and jumps directly to
#    the first hit child (left-first, matching pre-order), the right child,
#    or the escape — nodes whose box misses are never visited at all. The
#    flat scheme visits every child of a hit node just to discover the miss.
# 2. **Leaves hold up to `leaf_m` primitives inline.** Pure-sphere subtrees
#    with <= leaf_m primitives collapse into ONE leaf row carrying the
#    sphere data (and global ids) for all of them — the bottom log2(leaf_m)
#    levels of the tree disappear, and the per-step sphere tests are cheap
#    unrolled VPU work against the already-gathered row. Leaves containing
#    rects/boxes/media stay single-primitive and dispatch through the same
#    ``_leaf_candidate`` cond as the flat path.
#
# Together these cut traversal steps ~4-8x on the reference scenes (the
# lock-step wavefront pays the MAX path over all rays, so step count is the
# whole game). Functional contract is identical to ``bvh_scene_nearest``:
# same candidate math (bit-identical winners), same (t, gid) outputs.
# Mirrors the role of the reference's BVH (src/collision/bvh.rs:37-62) —
# the ray_hit recursion — with the branching factor re-tuned for a machine
# where the per-step gather, not the box test, is the cost.


@dataclasses.dataclass
class WideBVH:
    """Packed wide-node BVH rows (see module comment above).

    Row layout ([M, W] f32; int planes bitcast to f32 so everything rides
    ONE row gather per step):
      col 0   nav  (i32 bits): inner -> right-child index; leaf -> -1
      col 1   esc  (i32 bits): next node when this subtree is exhausted
      inner   cols 2-7  left-child AABB  (min xyz, max xyz)
              cols 8-13 right-child AABB
      leaf    cols 2 .. 2+leaf_m-1: slot gids (i32 bits; -1 = empty slot)
              cols 2+leaf_m ..: per-slot sphere data, ``slot_f`` floats
              each — static: cx cy cz r; moving: + dx dy dz time0 inv_dt.
              Non-sphere leaves have exactly one slot (gid >= rect offset)
              and zeroed sphere data.
    """

    pack: Any            # [M, W] f32 (np or jnp)
    leaf_m: int          # static: slots per leaf
    has_motion: bool     # static: slot stride (4 or 9 floats)

    @property
    def n_nodes(self) -> int:
        return self.pack.shape[0]

    @property
    def slot_f(self) -> int:
        return 9 if self.has_motion else 4


jax.tree_util.register_pytree_node(
    WideBVH,
    lambda b: ((b.pack,), (b.leaf_m, b.has_motion)),
    lambda aux, ch: WideBVH(ch[0], aux[0], aux[1]),
)


def widen_flat_bvh(flat: FlatBVH, scene: Scene, offsets,
                   features: Optional[SceneFeatures] = None,
                   leaf_m: Optional[int] = None) -> WideBVH:
    """Host-side post-pass: collapse a flat binary BVH into wide-node rows.

    Pure numpy over the already-built tree (so the C++ builder output is
    reused unchanged); sphere leaf data is inlined from the scene arrays.

    SNAPSHOT SEMANTICS (differs from the flat path): sphere centers/radii
    and motion data are BAKED into the packed rows at build time, so
    ``wide_scene_nearest`` intersects the geometry as of this call. The
    flat path (``bvh_scene_nearest``) gathers the live ``scene.spheres``
    arrays each trace and tracks parameter updates; a ``WideBVH`` reused
    after scene-parameter updates (e.g. an inverse-rendering loop) must be
    rebuilt or it silently returns hits against stale geometry.
    """
    f = features or SceneFeatures.all_on()
    assert scene.spheres.world_from_obj is None and \
        scene.rects.world_from_obj is None, (
            "widen_flat_bvh inlines world-space leaf data; instanced "
            "scenes use the flat layout"
        )
    has_motion = bool(f.has_motion)
    if leaf_m is None:
        leaf_m = (8 if not has_motion else 4) if f.has_spheres else 1
    off_s, off_r, off_b, off_m = offsets

    prim = np.asarray(flat.prim)
    esc = np.asarray(flat.escape)
    bb_min = np.asarray(flat.bb_min)
    bb_max = np.asarray(flat.bb_max)
    is_leaf = prim >= 0
    is_sph = is_leaf & (prim < off_r)
    # prefix sums -> O(1) "is this subtree all-sphere / how many prims"
    leaf_pre = np.concatenate([[0], np.cumsum(is_leaf)])
    sph_pre = np.concatenate([[0], np.cumsum(is_sph)])

    sd = 9 if has_motion else 4
    W = max(14, 2 + leaf_m * (1 + sd))

    sp = scene.spheres
    c_np = np.asarray(sp.center, np.float32)
    r_np = np.asarray(sp.radius, np.float32)
    if has_motion:
        d_np = np.asarray(sp.center_delta, np.float32)
        t0_np = np.asarray(sp.time0, np.float32)
        idt_np = np.asarray(sp.inv_time_delta, np.float32)

    rows: list = []
    nav: list = []
    escn: list = []

    def emit() -> int:
        rows.append(np.zeros(W, np.float32))
        nav.append(-1)
        escn.append(0)
        return len(rows) - 1

    def fill_leaf(row, gids):
        bits = np.full(leaf_m, -1, np.int32)
        bits[: len(gids)] = gids
        row[2:2 + leaf_m] = bits.view(np.float32)
        for k, g in enumerate(gids):
            if g < off_r:
                base = 2 + leaf_m + k * sd
                lid = int(g) - off_s
                row[base:base + 3] = c_np[lid]
                row[base + 3] = r_np[lid]
                if has_motion:
                    row[base + 4:base + 7] = d_np[lid]
                    row[base + 7] = t0_np[lid]
                    row[base + 8] = idt_np[lid]

    def build(i: int) -> int:
        n_leaf = leaf_pre[esc[i]] - leaf_pre[i]
        n_sph = sph_pre[esc[i]] - sph_pre[i]
        if is_leaf[i] or (n_sph == n_leaf and n_leaf <= leaf_m):
            me = emit()
            gids = prim[i:esc[i]]
            fill_leaf(rows[me], gids[gids >= 0])
            escn[me] = len(rows)
            return me
        l = i + 1
        r_ = esc[l]
        me = emit()
        rows[me][2:5] = bb_min[l]
        rows[me][5:8] = bb_max[l]
        rows[me][8:11] = bb_min[r_]
        rows[me][11:14] = bb_max[r_]
        build(l)
        nav[me] = build(r_)
        escn[me] = len(rows)
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        build(0)
    finally:
        sys.setrecursionlimit(old_limit)

    pack = np.stack(rows)
    pack[:, 0] = np.asarray(nav, np.int32).view(np.float32)
    pack[:, 1] = np.asarray(escn, np.int32).view(np.float32)
    return WideBVH(pack=pack, leaf_m=leaf_m, has_motion=has_motion)


def build_scene_wide_bvh(scene: Scene, features: Optional[SceneFeatures] = None,
                         seed: int = 0, leaf_m: Optional[int] = None,
                         use_native: bool = True):
    """Whole-scene wide BVH. Returns (wide, stats, offsets)."""
    flat, stats, offsets = build_scene_bvh(scene, seed=seed,
                                           use_native=use_native)
    wide = widen_flat_bvh(flat, scene, offsets, features=features,
                          leaf_m=leaf_m)
    return wide, stats, offsets


# Wide-traversal straggler-slicing knobs (same machinery as the flat path;
# the wide tree's shorter paths want a shorter bulk phase). Swept on-device.
_WIDE_BULK_IT = 8
_WIDE_SLICE_N = 16



def wide_scene_nearest(
    bvh: WideBVH,
    scene,
    ro,
    rd,
    time,
    med_u,
    t_min=MIN_T,
    t_max=MAX_T,
    features: Optional[SceneFeatures] = None,
    offsets=(0, 0, 0, 0),
):
    """Wavefront traversal over the wide-node BVH.

    Same contract as :func:`bvh_scene_nearest` — (t [R], gid [R]) with
    bit-identical winners (the candidate math is shared). One [R, W] row
    gather per step; inner steps test both child slabs, leaf steps test
    up to ``leaf_m`` inline spheres (plus the ``_leaf_candidate`` cond for
    non-sphere leaves).
    """
    f = features or SceneFeatures.all_on()
    pack = jnp.asarray(bvh.pack)
    n_nodes = pack.shape[0]
    M = bvh.leaf_m
    sd = bvh.slot_f
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    off_s, off_r, off_b, off_m = offsets
    R = ro.shape[0]
    rcp = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)
    INF = jnp.float32(_INF)
    bc = jax.lax.bitcast_convert_type

    has_other = f.has_rects or f.has_boxes or f.has_media
    f_other = f
    if has_other and f.has_spheres:
        kw = {k: getattr(f, k) for k in SceneFeatures.__slots__}
        kw["has_spheres"] = False
        f_other = SceneFeatures(**kw)

    def cond(state):
        cursor, best_t, best_i, it = state
        return jnp.any(cursor < n_nodes) & (it < 4 * n_nodes)

    def make_step(ro_s, rd_s, rcp_s, time_s, med_u_s):
        Rs = ro_s.shape[0]

        def body(state):
            cursor, best_t, best_i, it = state
            active = cursor < n_nodes
            cur = jnp.minimum(cursor, n_nodes - 1)
            row = pack[cur]                                # ONE row gather
            nav = bc(row[:, 0], jnp.int32)
            esc = bc(row[:, 1], jnp.int32)
            is_leaf = nav < 0

            def child_hit(b0):
                d0 = (row[:, b0:b0 + 3] - ro_s) * rcp_s
                d1 = (row[:, b0 + 3:b0 + 6] - ro_s) * rcp_s
                tn = jnp.max(jnp.minimum(d0, d1), axis=-1)
                tf = jnp.min(jnp.maximum(d0, d1), axis=-1)
                return jnp.minimum(tf, best_t) > jnp.maximum(tn, t_min)

            l_hit = child_hit(2)
            r_hit = child_hit(8)
            inner_next = jnp.where(l_hit, cur + 1,
                                   jnp.where(r_hit, nav, esc))

            do_leaf = active & is_leaf
            if f.has_spheres:
                for m in range(M):
                    gid_m = bc(row[:, 2 + m], jnp.int32)
                    base = 2 + M + m * sd
                    c0 = row[:, base:base + 3]
                    radius = row[:, base + 3]
                    if f.has_motion:
                        s = (time_s - row[:, base + 7]) * row[:, base + 8]
                        c0 = c0 + s[..., None] * row[:, base + 4:base + 7]
                    oc = ro_s - c0
                    b = jnp.sum(oc * rd_s, axis=-1)
                    cc = jnp.sum(oc * oc, axis=-1) - radius * radius
                    disc = b * b - cc
                    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
                    tt0 = -b - sq
                    tt1 = -b + sq
                    valid = do_leaf & (disc > 0.0) & (gid_m >= 0) & (gid_m < off_r)
                    t0_ok = valid & (tt0 > t_min) & (tt0 < best_t)
                    t1_ok = valid & (tt1 > t_min) & (tt1 < best_t)
                    cand = jnp.where(t0_ok, tt0, jnp.where(t1_ok, tt1, INF))
                    better = cand < best_t
                    best_t = jnp.where(better, cand, best_t)
                    best_i = jnp.where(better, gid_m, best_i)
            if has_other:
                gid0 = bc(row[:, 2], jnp.int32)
                guard = do_leaf & (gid0 >= off_r)

                def _other(_):
                    gid = jnp.where(guard, gid0, 0)
                    return _leaf_candidate(
                        scene, gid, offsets, f_other, ro_s, rd_s, time_s,
                        med_u_s, best_t, t_min,
                    )

                if f.has_spheres:
                    cand_o = jax.lax.cond(
                        jnp.any(guard), _other,
                        lambda _: jnp.full((Rs,), _INF, jnp.float32), 0,
                    )
                else:
                    cand_o = _other(0)
                better = guard & (cand_o < best_t)
                best_t = jnp.where(better, cand_o, best_t)
                best_i = jnp.where(better, gid0, best_i)

            nxt = jnp.where(is_leaf, esc, inner_next)
            cursor = jnp.where(active, nxt, cursor)
            return cursor, best_t, best_i, it + 1

        return body

    return _run_traversal(
        cond, make_step, ro, rd, rcp, time, med_u, R, n_nodes, t_max,
        need_med=(has_other and f.has_media),
        bulk_it=_WIDE_BULK_IT, slice_n=_WIDE_SLICE_N,
    )


def _run_traversal(cond, make_step, ro, rd, rcp, time, med_u, R, n_nodes,
                   t_max, need_med, bulk_it, slice_n):
    """Shared traversal driver: plain lock-step loop, or straggler slicing.

    The lock-step loop pays the MAX traversal path over the wavefront
    while the MEAN path is far shorter: most lanes finish early and ride
    along dead. Straggler slicing amortizes the tail with static shapes
    only: a bulk fori phase, then a stable unfinished-first partition,
    then ``slice_n`` independent while_loops over R/slice_n-sized slices —
    slices holding only finished lanes exit on their first cond, so tail
    steps cost R/slice_n-sized iterations instead of full-R ones. Per-lane
    traversal is order-independent, so results are bit-identical to the
    plain loop.
    """
    init = (
        jnp.zeros(R, jnp.int32),
        jnp.full(R, t_max, jnp.float32),
        jnp.zeros(R, jnp.int32),
        jnp.int32(0),
    )
    body_full = make_step(ro, rd, rcp, time, med_u)
    sliced = (
        R >= (1 << 15) and R % (128 * slice_n) == 0 and n_nodes >= 64
    )
    if not sliced:
        _, best_t, best_i, _ = jax.lax.while_loop(cond, body_full, init)
        best_t = jnp.where(best_t < t_max, best_t, jnp.float32(_INF))
        return best_t, best_i

    from pathtrace_tpu.render.compact_util import (
        _pack_rows,
        _unpack_rows,
        partition_order,
    )

    state = jax.lax.fori_loop(0, bulk_it, lambda i, s: body_full(s), init)
    cursor, best_t, best_i, it = state

    # stable partition: unfinished lanes to the front
    order, pos, _ = partition_order(cursor < n_nodes)      # order: slot->ray

    # permute: [R] planes ride ONE packed row gather; [R,3] rows directly.
    # DTYPE TRAP: the pack must be i32, not f32 — small ints bitcast to f32
    # are denormals, and _pack_rows' minor-dim transpose lowers through the
    # MXU on TPU, which flushes denormals to zero (observed: gid plane
    # zeroed, t plane fine). f32 VALUES bitcast to i32 survive any integer
    # movement, so everything rides the int pack.
    bc = jax.lax.bitcast_convert_type
    packed = _pack_rows(
        [bc(best_t, jnp.int32), bc(time, jnp.int32), cursor, best_i], R,
    )[order]
    t_bits, tm_bits, cursor_p, best_i_p = _unpack_rows(packed, 4)
    best_t_p = bc(t_bits, jnp.float32)
    time_p = bc(tm_bits, jnp.float32)
    ro_p, rd_p, rcp_p = ro[order], rd[order], rcp[order]
    med_u_p = med_u[order] if need_med else None

    # (A geometric mid-phase — bounded fori over the front R/4 after the
    # partition, before the slices — was tried in r4 and measured neutral:
    # 1731 vs 1705-1724 ms on the 1M in-situ trace. Not kept.)
    Rs = R // slice_n
    outs_t, outs_i = [], []
    for s in range(slice_n):
        sl = slice(s * Rs, (s + 1) * Rs)
        body_s = make_step(
            ro_p[sl], rd_p[sl], rcp_p[sl], time_p[sl],
            med_u_p[sl] if med_u_p is not None else None,
        )
        st = jax.lax.while_loop(
            cond, body_s, (cursor_p[sl], best_t_p[sl], best_i_p[sl], it)
        )
        outs_t.append(st[1])
        outs_i.append(st[2])

    # un-permute: ray i's result sits at slot pos[i] — ONE packed i32 row
    # gather back (same denormal rule as above: t rides as bits)
    out = _pack_rows(
        [bc(jnp.concatenate(outs_t), jnp.int32), jnp.concatenate(outs_i)], R,
    )[pos]
    t_bits, best_i = _unpack_rows(out, 2)
    best_t = bc(t_bits, jnp.float32)
    best_t = jnp.where(best_t < t_max, best_t, jnp.float32(_INF))
    return best_t, best_i


def scene_record_from_gid(scene: Scene, t, gid, ro, rd, time, offsets,
                          features: Optional[SceneFeatures] = None):
    """Hit record for global-id winners: per-kind record + range select.

    Reuses the per-kind ``*_record`` builders from ``ops.intersect`` so
    normals/UVs/material ids are identical to the brute-force path.
    """
    from pathtrace_tpu.ops import intersect as isect

    f = features or SceneFeatures.all_on()
    off_s, off_r, off_b, off_m = offsets
    rec = None

    def merge(rec, nxt, in_kind):
        return nxt if rec is None else isect._select_record(
            jnp.logical_not(in_kind), rec, nxt
        )

    INF = jnp.float32(_INF)
    if f.has_spheres:
        in_k = (t < INF) & (gid < off_r)
        pid = jnp.clip(gid - off_s, 0, scene.spheres.count - 1)
        t_k = jnp.where(in_k, t, INF)
        rec = merge(rec, isect.sphere_record(
            scene.spheres, t_k, pid, ro, rd, time, with_uv=f.has_image
        ), in_k)
    if f.has_rects:
        in_k = (t < INF) & (gid >= off_r) & (gid < off_b)
        pid = jnp.clip(gid - off_r, 0, scene.rects.count - 1)
        t_k = jnp.where(in_k, t, INF)
        rec = merge(rec, isect.rect_record(scene.rects, t_k, pid, ro, rd), in_k)
    if f.has_boxes:
        in_k = (t < INF) & (gid >= off_b) & (gid < off_m)
        pid = jnp.clip(gid - off_b, 0, scene.boxes.count - 1)
        t_k = jnp.where(in_k, t, INF)
        rec = merge(rec, isect.box_record(scene.boxes, t_k, pid, ro, rd), in_k)
    if f.has_media:
        in_k = (t < INF) & (gid >= off_m)
        pid = jnp.clip(gid - off_m, 0, scene.media.count - 1)
        t_k = jnp.where(in_k, t, INF)
        rec = merge(rec, isect.media_record(scene.media, t_k, pid, ro, rd), in_k)
    if rec is None:
        rec = isect._miss_record(ro)
    # a winner exists wherever t is finite; per-kind records already carry
    # hit=False on their INF lanes, so the merged record is consistent
    return rec


def make_bvh_intersect_fn(bvh, offsets, features: SceneFeatures):
    """Bind a whole-scene BVH (flat or wide) into the integrator's
    ``intersect_fn`` slot."""
    nearest = (wide_scene_nearest if isinstance(bvh, WideBVH)
               else bvh_scene_nearest)

    def fn(scene, ro, rd, time, med_u, t_min=MIN_T, t_max=MAX_T):
        t, gid = nearest(
            bvh, scene, ro, rd, time, med_u, t_min, t_max,
            features=features, offsets=offsets,
        )
        return scene_record_from_gid(
            scene, t, gid, ro, rd, time, offsets, features=features
        )

    return fn
