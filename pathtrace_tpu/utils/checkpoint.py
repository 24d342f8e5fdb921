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
