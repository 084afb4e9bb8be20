"""ctypes bindings for the native (C++) data-pipeline kernels.

The shared library is built lazily from csrc/skel_ops.cpp with g++ (no
pybind11 dependency); every entry point has a NumPy fallback, so the
framework works identically without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "skel_ops.cpp")
_LIB_PATH = os.path.join(_ROOT, "csrc", "libskel_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.prenormalize3d.restype = ctypes.c_int
        lib.prenormalize3d.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            fp, fp]
        lib.joint_to_bone.restype = None
        lib.joint_to_bone.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ip, ctypes.c_int, fp]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def prenormalize3d(keypoint: np.ndarray, align_spine: bool = True,
                   align_center: bool = True, zaxis=(0, 1), xaxis=(8, 4)
                   ) -> Optional[Tuple[np.ndarray, int, np.ndarray]]:
    """Native PreNormalize3D; returns (kept (M,T_new,V,3), T_new, center)
    or None if the native library is unavailable / input unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    kp = np.ascontiguousarray(keypoint, dtype=np.float32)
    M, T, V, C = kp.shape
    if C != 3 or M > 2:
        return None
    out = np.empty_like(kp)
    center = np.zeros(3, np.float32)
    t_new = lib.prenormalize3d(kp, M, T, V, int(align_spine),
                               int(align_center), zaxis[0], zaxis[1],
                               xaxis[0], xaxis[1], out, center)
    if t_new < 0:
        return None
    return out[:, :t_new].copy(), int(t_new), center


def joint_to_bone(keypoint: np.ndarray, pairs) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    kp = np.ascontiguousarray(keypoint, dtype=np.float32)
    M, T, V, C = kp.shape
    pairs_arr = np.ascontiguousarray(np.asarray(pairs, np.int32))
    out = np.empty_like(kp)
    lib.joint_to_bone(kp, M, T, V, C, pairs_arr.reshape(-1),
                      len(pairs_arr), out)
    return out
