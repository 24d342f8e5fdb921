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


def _radiance_of(state, radiance_fields):
    if len(radiance_fields) == 1:
        return getattr(state, radiance_fields[0])
    # plane-form state (e.g. the fused fast path): rgb as three [R] planes
    return jnp.stack([getattr(state, f) for f in radiance_fields], axis=1)


@functools.partial(
    jax.jit, static_argnames=("next_size", "radiance_fields"),
    donate_argnums=(0,),
)
def compact(out_radiance, state, indices, next_size: int,
            radiance_fields=("radiance",)):
    """Flush radiance to the full-size buffer and gather alive lanes to the
    front at ``next_size`` (stable partition: original order kept)."""
    out_radiance = out_radiance.at[indices].add(
        _radiance_of(state, radiance_fields)
    )
    order = jnp.argsort(jnp.logical_not(state.alive), stable=True)
    perm = order[:next_size]
    R = state.alive.shape[0]

    def take(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == R:
            return leaf[perm]
        return leaf

    new_state = jax.tree_util.tree_map(take, state)
    if len(radiance_fields) == 1:
        zeros = {radiance_fields[0]: jnp.zeros((next_size, 3),
                                               out_radiance.dtype)}
    else:
        zeros = {f: jnp.zeros((next_size,), out_radiance.dtype)
                 for f in radiance_fields}
    new_state = new_state._replace(**zeros)
    return out_radiance, new_state, indices[perm]


@functools.partial(jax.jit, static_argnames=("radiance_fields",))
def final_flush(out_radiance, state, indices, radiance_fields=("radiance",)):
    return out_radiance.at[indices].add(_radiance_of(state, radiance_fields))
