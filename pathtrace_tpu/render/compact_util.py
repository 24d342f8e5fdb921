"""Shared stream-compaction primitives.

Used by both host-driven compaction ladders — the fast path
(:mod:`pathtrace_tpu.ops.fastpath`) and the general integrator's
(:mod:`pathtrace_tpu.render.compaction`). The state is any NamedTuple with
``radiance [R, 3]`` and ``alive [R]`` fields; every other leaf whose leading
axis is the wavefront axis is permuted along with them, scalars ride through
untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rung(n_alive: int, minimum: int) -> int:
    """Smallest power-of-two >= n_alive (and >= minimum)."""
    size = max(int(n_alive), minimum, 1)
    return 1 << (size - 1).bit_length()


def partition_order(mask):
    """Stable-partition permutation: True lanes first, both sides in
    original order, from ONE cumsum (k-th true lane -> slot k; false lanes
    follow as ``m + (falses before i)`` = ``m + i - prefix[i]``).

    Returns ``(order, pos, m)``: ``order[k]`` = lane at slot k (gather
    indices), ``pos[i]`` = slot of lane i (order's inverse, scatter/
    un-permute indices), ``m`` = True count. Shared by the lane and row
    compaction below and the BVH straggler slicing
    (:func:`pathtrace_tpu.models.bvh.bvh_scene_nearest`).
    """
    n = mask.shape[0]
    prefix = jnp.cumsum(mask.astype(jnp.int32))
    m = prefix[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.where(mask, prefix - 1, m + iota - prefix)
    order = jnp.zeros(n, jnp.int32).at[pos].set(iota)
    return order, pos, m


def _flush(out_radiance, state, indices, radiance_fields, identity):
    """Accumulate the state's radiance into the full-size output.

    ``identity`` (static, host-known): before the FIRST compaction the
    indices are still 0..R-1, so the flush is a dense add — skipping the
    scatter matters, because the first flush is the largest one.
    ``out_radiance`` is a single [R, 3] buffer or a tuple of [R] planes,
    matching the radiance fields."""
    rads = [getattr(state, f) for f in radiance_fields]
    if len(radiance_fields) == 1:
        rad = rads[0]
        return out_radiance + rad if identity else out_radiance.at[indices].add(rad)
    if identity:
        return tuple(o + r for o, r in zip(out_radiance, rads))
    return tuple(o.at[indices].add(r) for o, r in zip(out_radiance, rads))


def _pack_rows(planes, R: int):
    """Pack K [R] planes into ONE [R, K] row matrix.

    jnp.stack on axis=1 is K contiguous copies into a (rows, K, 128) cube;
    the single minor-dim transpose to (rows, 128, K) is the cheap
    direction on this target (~5 ms/1M for K=24, tools/split_probe.py)."""
    rows = R // 128
    cube = jnp.stack([p.reshape(rows, 128) for p in planes], axis=1)
    return cube.transpose(0, 2, 1).reshape(R, len(planes))


def _unpack_rows(mat, K: int):
    n = mat.shape[0]
    rows = n // 128
    cube = mat.reshape(rows, 128, K).transpose(0, 2, 1)   # (rows, K, 128)
    return [cube[:, k, :].reshape(n) for k in range(K)]


@functools.partial(
    jax.jit, static_argnames=("next_size", "radiance_fields", "identity"),
    donate_argnums=(0,),
)
def compact(out_radiance, state, indices, next_size: int,
            radiance_fields=("radiance",), identity: bool = False):
    """Flush radiance to the full-size buffer and gather alive lanes to the
    front at ``next_size`` (stable partition: original order kept).

    Cost anatomy on the target device (tools/frame_breakdown.py,
    tools/compact_probe.py): an argsort partition is a full comparison
    sort — 933 ms at 3.7M rays; prefix-sum + one scatter is O(R) passes.
    The dominant remaining term was the per-plane XLA lane gathers
    (~13 ms/1M each x 12-15 planes), so all [R] planes ride ONE packed
    [R, K] row gather (row gathers amortize ~5x over lane gathers) with a
    minor-dim transpose on each side."""
    out_radiance = _flush(out_radiance, state, indices, radiance_fields,
                          identity)
    R = state.alive.shape[0]
    order, _, _ = partition_order(state.alive)
    perm = order[:next_size]

    # radiance restarts at zero after a flush — strip those leaves BEFORE
    # the gather so they cost no permutation work
    dtype = getattr(state, radiance_fields[0]).dtype
    stripped = state._replace(
        **{f: jnp.zeros((), dtype) for f in radiance_fields}
    )

    leaves, treedef = jax.tree_util.tree_flatten(stripped)
    packable = (
        R % 128 == 0
        and next_size % 128 == 0
        and hasattr(indices, "ndim")
    )

    def is_plane(leaf):
        return (
            hasattr(leaf, "ndim") and leaf.ndim == 1 and leaf.shape[0] == R
        )

    if packable:
        # pack [R] planes into one f32 and one i32 row matrix (+ indices);
        # bools/uints ride the i32 pack via exact casts/bitcasts
        f_slots, i_slots = [], []
        f_planes, i_planes = [], []
        restore = {}
        for j, leaf in enumerate(leaves):
            if not is_plane(leaf):
                continue
            if leaf.dtype == jnp.float32:
                f_slots.append(j)
                f_planes.append(leaf)
            elif leaf.dtype in (jnp.int32, jnp.uint32, jnp.bool_):
                restore[j] = leaf.dtype
                i_slots.append(j)
                if leaf.dtype == jnp.uint32:
                    leaf = jax.lax.bitcast_convert_type(leaf, jnp.int32)
                elif leaf.dtype == jnp.bool_:
                    leaf = leaf.astype(jnp.int32)
                i_planes.append(leaf)
        i_slots.append(-1)                       # indices ride the i32 pack
        i_planes.append(indices)

        if f_planes:
            f_out = _unpack_rows(_pack_rows(f_planes, R)[perm], len(f_planes))
            for j, p in zip(f_slots, f_out):
                leaves[j] = p
        i_out = _unpack_rows(_pack_rows(i_planes, R)[perm], len(i_planes))
        for j, p in zip(i_slots, i_out):
            if j == -1:
                new_indices = p
            else:
                dt = restore[j]
                if dt == jnp.uint32:
                    p = jax.lax.bitcast_convert_type(p, jnp.uint32)
                elif dt == jnp.bool_:
                    p = p != 0
                leaves[j] = p
        # any remaining wavefront leaves ([R, 3] arrays, odd dtypes) are
        # already row gathers / rare — take them directly
        leaves = [
            leaf[perm]
            if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[:1] == (R,) and leaf.shape != (next_size,))
            else leaf
            for leaf in leaves
        ]
        new_state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        def take(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == R:
                return leaf[perm]
            return leaf

        new_state = jax.tree_util.tree_map(take, stripped)
        new_indices = indices[perm]

    if len(radiance_fields) == 1:
        zeros = {radiance_fields[0]: jnp.zeros((next_size, 3), dtype)}
    else:
        zeros = {f: jnp.zeros((next_size,), dtype) for f in radiance_fields}
    new_state = new_state._replace(**zeros)
    return out_radiance, new_state, new_indices


@functools.partial(
    jax.jit, static_argnames=("radiance_fields", "identity"),
)
def final_flush(out_radiance, state, indices, radiance_fields=("radiance",),
                identity: bool = False):
    return _flush(out_radiance, state, indices, radiance_fields, identity)


ROW = 128  # lanes per compaction row (one VPU lane tile)


@functools.partial(
    jax.jit, static_argnames=("next_rows", "radiance_fields", "identity"),
    donate_argnums=(0,),
)
def compact_rows(out_radiance, state, indices, next_rows: int,
                 radiance_fields=("radiance",), identity: bool = False):
    """Row-granular compaction: drop whole 128-lane rows whose every lane
    is dead, keeping survivors' rows intact (stable row order).

    Why rows: ray death is spatially correlated (sky regions kill whole
    pixel runs), so all-dead rows are common — and row compaction is
    nearly free where lane compaction is not. The permutation is built at
    row scale (R/128 elements: the cumsum + scatter cost ~nothing), and
    every data move is a contiguous row gather — no minor-dim transposes,
    no per-lane gathers. Lanes never change their intra-row slot, so lane
    ids (and the counter-hash RNG keyed on them) ride along bit-exactly;
    kept-but-dead lanes keep costing kernel work, which is the status quo
    between compactions anyway. Use at multi-M sizes, then switch to the
    exact lane compaction (:func:`compact`) once the wavefront is small.
    """
    out_radiance = _flush(out_radiance, state, indices, radiance_fields,
                          identity)
    R = state.alive.shape[0]
    rows = R // ROW
    row_alive = jnp.any(state.alive.reshape(rows, ROW), axis=1)
    order, _, _ = partition_order(row_alive)
    row_perm = order[:next_rows]
    next_size = next_rows * ROW

    dtype = getattr(state, radiance_fields[0]).dtype
    stripped = state._replace(
        **{f: jnp.zeros((), dtype) for f in radiance_fields}
    )

    def take(leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == R):
            return leaf
        tail = leaf.shape[1:]
        rowed = leaf.reshape((rows, ROW) + tail)
        return rowed[row_perm].reshape((next_size,) + tail)

    new_state = jax.tree_util.tree_map(take, stripped)
    if len(radiance_fields) == 1:
        zeros = {radiance_fields[0]: jnp.zeros((next_size, 3), dtype)}
    else:
        zeros = {f: jnp.zeros((next_size,), dtype) for f in radiance_fields}
    new_state = new_state._replace(**zeros)
    return out_radiance, new_state, take(indices)
