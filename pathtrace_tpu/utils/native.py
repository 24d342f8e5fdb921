"""ctypes bindings for the native C++ runtime components.

The reference is 100% native code; here the *device* path is JAX/XLA/Pallas
and the host-side runtime pieces that dominate scene-build latency (BVH
construction today) are C++ (``native/``), loaded via ctypes with a numpy
fallback when the shared library has not been built.

Build: ``make -C native`` (done automatically on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpathtrace_native.so"))

_lib = None
_load_failed = False


def _ensure_built() -> bool:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "bvh_builder.cpp"))
    if os.path.exists(_LIB_PATH):
        try:
            if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
                return True
        except OSError:
            return True
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.SubprocessError, OSError):
        return os.path.exists(_LIB_PATH)
    return os.path.exists(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    ``PATHTRACE_NO_NATIVE=1`` forces the numpy fallback (runtime control
    and a bisection lever for in-process heap issues).
    """
    global _lib, _load_failed
    if os.environ.get("PATHTRACE_NO_NATIVE", "").lower() not in (
        "", "0", "false", "no",
    ):
        return None
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not _ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ptpu_build_bvh.restype = ctypes.c_int32
    lib.ptpu_build_bvh.argtypes = [
        f32p, f32p, i32p, ctypes.c_int32, ctypes.c_uint64,
        f32p, f32p, i32p, i32p, i32p,
    ]
    if hasattr(lib, "ptpu_build_bvh_v2"):
        lib.ptpu_build_bvh_v2.restype = ctypes.c_int32
        lib.ptpu_build_bvh_v2.argtypes = [
            f32p, f32p, i32p, ctypes.c_int32, ctypes.c_uint64,
            ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p,
        ]
    _lib = lib
    return _lib


def native_build_bvh(bb_min, bb_max, ids, seed, strategy: str = "median"):
    """Build a flattened BVH via the C++ builder.

    Returns (FlatBVH, BVHStats) or None if the native lib is unavailable
    (or too old for the requested strategy — caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None:
        return None
    strat = {"median": 0, "sah": 1}[strategy]
    if strat and not hasattr(lib, "ptpu_build_bvh_v2"):
        return None
    from pathtrace_tpu.models.bvh import BVHStats, FlatBVH

    bb_min = np.ascontiguousarray(bb_min, np.float32)
    bb_max = np.ascontiguousarray(bb_max, np.float32)
    ids = np.ascontiguousarray(ids, np.int32)
    n = ids.shape[0]
    m_max = 2 * n - 1 if n > 1 else 1
    out_min = np.empty((m_max, 3), np.float32)
    out_max = np.empty((m_max, 3), np.float32)
    out_escape = np.empty(m_max, np.int32)
    out_prim = np.empty(m_max, np.int32)
    out_stats = np.zeros(3, np.int32)
    if hasattr(lib, "ptpu_build_bvh_v2"):
        m = lib.ptpu_build_bvh_v2(
            bb_min, bb_max, ids, n, np.uint64(seed if seed else 1), strat,
            out_min, out_max, out_escape, out_prim, out_stats,
        )
    else:
        m = lib.ptpu_build_bvh(
            bb_min, bb_max, ids, n, np.uint64(seed if seed else 1),
            out_min, out_max, out_escape, out_prim, out_stats,
        )
    if m <= 0:
        return None
    flat = FlatBVH(
        bb_min=out_min[:m].copy(),
        bb_max=out_max[:m].copy(),
        escape=out_escape[:m].copy(),
        prim=out_prim[:m].copy(),
    )
    stats = BVHStats(
        node_count=int(out_stats[0]),
        leaf_count=int(out_stats[1]),
        max_depth=int(out_stats[2]),
    )
    return flat, stats
