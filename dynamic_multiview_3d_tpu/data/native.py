"""ctypes binding to the native C++ frame packer (csrc/framepack.cpp).

``resize_normalize_pack`` is the host-side per-batch hot loop (uint8 decode
output -> resized, normalized float32 NHWC). Falls back to numpy when the
shared library hasn't been built; ``build()`` compiles it with the system
g++ (no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libdmv3d_framepack.so")

_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library; returns True on success."""
    try:
        subprocess.run(["make", "-C", _CSRC],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.dmv3d_resize_normalize_pack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.dmv3d_gather_pack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.dmv3d_num_threads.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def resize_normalize_pack(frames_u8: np.ndarray, h_out: int, w_out: int
                          ) -> np.ndarray:
    """uint8 [..., H, W, C] -> float32 [..., h_out, w_out, C] in [-1, 1]."""
    lead = frames_u8.shape[:-3]
    h_in, w_in, c = frames_u8.shape[-3:]
    flat = np.ascontiguousarray(
        frames_u8.reshape(-1, h_in, w_in, c), dtype=np.uint8)
    n = flat.shape[0]
    lib = _load()
    if lib:
        out = np.empty((n, h_out, w_out, c), np.float32)
        lib.dmv3d_resize_normalize_pack(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h_in, w_in, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h_out, w_out)
        return out.reshape(*lead, h_out, w_out, c)
    # numpy fallback: nearest-free bilinear via cv2 when shape changes
    if (h_in, w_in) != (h_out, w_out):
        import cv2
        flat = np.stack([
            cv2.resize(f, (w_out, h_out), interpolation=cv2.INTER_LINEAR)
            for f in flat])
    return (flat.astype(np.float32) / 127.5 - 1.0) \
        .reshape(*lead, h_out, w_out, c)


def gather_pack(store_u8: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """store [num, H, W, C] uint8 + indices [K] -> float32 [K,H,W,C] [-1,1]."""
    lib = _load()
    idx = np.ascontiguousarray(indices, np.int64)
    frame_shape = store_u8.shape[1:]
    if lib:
        store = np.ascontiguousarray(store_u8)
        out = np.empty((len(idx),) + frame_shape, np.float32)
        lib.dmv3d_gather_pack(
            store.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), int(np.prod(frame_shape)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return store_u8[idx].astype(np.float32) / 127.5 - 1.0
