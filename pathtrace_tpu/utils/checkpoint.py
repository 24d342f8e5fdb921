"""Render checkpoint/resume.

The reference's only persistence is the PNG written on exit
(reference ``src/offline.rs:52-59``, ``src/glium_window.rs:215-227``); its
full render state is just (accumulation buffer, frame_num, seed)
(``src/scene.rs:86-87``). We persist exactly that — with counter-based
Threefry RNG, (seed, frame_num) fully determines every future sample, so
resume is bit-exact.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def save(path: str, acc_image: np.ndarray, frame_num: int, seed: int) -> None:
    np.savez(
        path,
        acc_image=np.asarray(acc_image, np.float32),
        frame_num=np.int64(frame_num),
        seed=np.int64(seed),
    )


def load(path: str) -> Tuple[np.ndarray, int, int]:
    with np.load(path) as z:
        return z["acc_image"], int(z["frame_num"]), int(z["seed"])


def try_load(path: Optional[str]):
    if not path:
        return None
    try:
        return load(path)
    except (FileNotFoundError, OSError):
        return None


# ---------------------------------------------------------------------------
# Inverse-rendering train state (SURVEY.md §5: "for inverse rendering, also
# optimizer state"). The reference has no training loop at all; here the
# full resumable state is (params, opt_state, step) + the RNG key, and with
# the counter-based RNG a resumed run is bit-exact with an uninterrupted one
# (tests/test_grad.py::test_train_checkpoint_resume_bit_exact).
#
# Serialization is a flat leaf list (np.savez); the pytree STRUCTURE is not
# persisted — callers pass a template TrainState (renderer.init(...) output)
# whose treedef re-assembles the leaves. This keeps the format dependency-
# free and robust to optax's unregistered-in-npz state classes.
# ---------------------------------------------------------------------------


def save_train(path: str, state, key=None) -> None:
    """Persist a TrainState (+ optional PRNG key) to ``path`` (.npz)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten(
        (state.params, state.opt_state, state.step)
    )
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrs["n_leaves"] = np.int64(len(flat))
    if key is not None:
        arrs["rng_key"] = np.asarray(key)
    np.savez(path, **arrs)


def load_train(path: str, template_state):
    """Load a TrainState saved by :func:`save_train`.

    ``template_state`` supplies the pytree structure (same renderer +
    optimizer configuration that produced the save). Returns
    ``(state, key_or_None)``.
    """
    import jax

    with np.load(path) as z:
        n = int(z["n_leaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        key = z["rng_key"] if "rng_key" in z.files else None
    flat_t, treedef = jax.tree_util.tree_flatten(
        (template_state.params, template_state.opt_state, template_state.step)
    )
    if len(flat_t) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but the template state has "
            f"{len(flat_t)} — renderer/optimizer configuration mismatch"
        )
    params, opt_state, step = jax.tree_util.tree_unflatten(treedef, leaves)
    return type(template_state)(params, opt_state, step), key


def try_load_train(path: Optional[str], template_state):
    if not path:
        return None
    try:
        return load_train(path, template_state)
    except (FileNotFoundError, OSError):
        return None
