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


@functools.partial(
    jax.jit, static_argnames=("next_size", "radiance_fields", "identity"),
    donate_argnums=(0,),
)
def compact(out_radiance, state, indices, next_size: int,
            radiance_fields=("radiance",), identity: bool = False):
    """Flush radiance to the full-size buffer and gather alive lanes to the
    front at ``next_size`` (stable partition: original order kept)."""
    out_radiance = _flush(out_radiance, state, indices, radiance_fields,
                          identity)
    # stable partition via prefix sums + one scatter: O(R) passes. An
    # argsort here is a full comparison sort — measured 933 ms for one
    # 3.7M-ray compaction on the target device (tools/frame_breakdown.py),
    # half the frame time.
    R = state.alive.shape[0]
    alive_i = state.alive.astype(jnp.int32)
    alive_prefix = jnp.cumsum(alive_i)
    pos = jnp.where(
        state.alive,
        alive_prefix - 1,                                  # k-th alive -> k
        alive_prefix[-1] + jnp.cumsum(1 - alive_i) - 1,    # dead follow, in order
    )
    order = jnp.zeros(R, jnp.int32).at[pos].set(jnp.arange(R, dtype=jnp.int32))
    perm = order[:next_size]

    def take(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == R:
            return leaf[perm]
        return leaf

    # radiance restarts at zero after a flush — strip those leaves BEFORE
    # the gather so they cost no permutation work
    dtype = getattr(state, radiance_fields[0]).dtype
    stripped = state._replace(
        **{f: jnp.zeros((), dtype) for f in radiance_fields}
    )
    new_state = jax.tree_util.tree_map(take, stripped)
    if len(radiance_fields) == 1:
        zeros = {radiance_fields[0]: jnp.zeros((next_size, 3), dtype)}
    else:
        zeros = {f: jnp.zeros((next_size,), dtype) for f in radiance_fields}
    new_state = new_state._replace(**zeros)
    return out_radiance, new_state, indices[perm]


@functools.partial(
    jax.jit, static_argnames=("radiance_fields", "identity"),
)
def final_flush(out_radiance, state, indices, radiance_fields=("radiance",),
                identity: bool = False):
    return _flush(out_radiance, state, indices, radiance_fields, identity)
