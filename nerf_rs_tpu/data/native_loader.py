"""ctypes binding to the C++ host batch assembler (native/).

Provides a drop-in ``gather_fn`` for pipeline.HostSampler and a full
``assemble_batch`` used by the prefetch pipeline when
DataConfig.use_native_loader is set. Falls back silently (returns None
from ``load``) when no compiler is available — the numpy path is always
correct, just slower on large batches.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load libnerf_host.so; None on failure."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from ..native.build import build

        lib = ctypes.CDLL(build())
    except Exception:
        return None
    i8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.nerf_gather_gold.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, ctypes.c_int64, ctypes.c_int32, f32p,
    ]
    lib.nerf_assemble_batch.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32,
        i32p, i32p, i32p, f32p,
    ]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def gather_gold(
    images: np.ndarray,
    view_idx: np.ndarray,
    xi: np.ndarray,
    yi: np.ndarray,
    white_background: bool,
) -> np.ndarray:
    """HostSampler-compatible gather: (n,) indices -> (n, 3) f32 gold."""
    lib = load()
    assert lib is not None, "native loader unavailable"
    images = np.ascontiguousarray(images)
    view_idx = np.ascontiguousarray(view_idx, np.int32)
    xi = np.ascontiguousarray(xi, np.int32)
    yi = np.ascontiguousarray(yi, np.int32)
    n = view_idx.shape[0]
    out = np.empty((n, 3), np.float32)
    lib.nerf_gather_gold(
        _ptr(images, ctypes.c_uint8),
        images.shape[0], images.shape[1], images.shape[2],
        _ptr(view_idx, ctypes.c_int32), _ptr(xi, ctypes.c_int32),
        _ptr(yi, ctypes.c_int32), n, int(white_background),
        _ptr(out, ctypes.c_float),
    )
    return out


def assemble_batch(
    images: np.ndarray, seed: int, step: int, n: int, white_background: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full native batch: (view_idx, xi, yi, gold), deterministic in
    (seed, step)."""
    lib = load()
    assert lib is not None, "native loader unavailable"
    images = np.ascontiguousarray(images)
    view_idx = np.empty(n, np.int32)
    xi = np.empty(n, np.int32)
    yi = np.empty(n, np.int32)
    gold = np.empty((n, 3), np.float32)
    lib.nerf_assemble_batch(
        _ptr(images, ctypes.c_uint8),
        images.shape[0], images.shape[1], images.shape[2],
        seed, step, n, int(white_background),
        _ptr(view_idx, ctypes.c_int32), _ptr(xi, ctypes.c_int32),
        _ptr(yi, ctypes.c_int32), _ptr(gold, ctypes.c_float),
    )
    return view_idx, xi, yi, gold
