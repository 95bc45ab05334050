"""ctypes loader for the native host codec (``codec.cpp``).

Builds ``libseg3dcodec.so`` lazily with ``g++`` the first time it is needed,
caches the binary under ``~/.cache/seg3d_native/<source-hash>/`` so rebuilds
only happen when the source changes, and degrades to ``None`` (numpy
fallback in the callers) when no toolchain is available or
``SEG3D_NATIVE=0``. ctypes ``CDLL`` calls release the GIL, so the pack runs
truly concurrently with the reader/writer threads' Python work.

The reference has no native first-party code (SURVEY.md §2 — its host path
is SimpleITK's C++); this module is the TPU framework's equivalent muscle
for the host stages the profiler showed on the critical path
(BASELINE.md "End-to-end" section).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "codec.cpp")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build() -> str | None:
    """Compile codec.cpp into a cached .so; return its path or None."""
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "seg3d_native", tag)
    so = os.path.join(cache, "libseg3dcodec.so")
    if os.path.exists(so):
        return so
    os.makedirs(cache, exist_ok=True)
    tmp = so + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic vs concurrent builders
        return so
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib():
    """The loaded codec library, or None (callers fall back to numpy)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    with _lock:
        if _lib_tried:
            return _lib
        lib = None
        if os.environ.get("SEG3D_NATIVE", "1") != "0":
            so = _build()
            if so is not None:
                try:
                    lib = ctypes.CDLL(so)
                    _declare(lib)
                except OSError:
                    lib = None
        _lib = lib
        _lib_tried = True
    return _lib


def _declare(lib) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.seg3d_minmax_i16.argtypes = [i16p, ctypes.c_size_t, i32p, i32p]
    lib.seg3d_minmax_u16.argtypes = [u16p, ctypes.c_size_t, i32p, i32p]
    lib.seg3d_sub_u8.argtypes = [u16p, ctypes.c_size_t, ctypes.c_uint16, u8p]
    lib.seg3d_pack12_u16.argtypes = [u16p, ctypes.c_size_t, ctypes.c_uint16,
                                     u8p, u8p, u8p]
    lib.seg3d_unpack_bits.argtypes = [u8p, ctypes.c_size_t, ctypes.c_int, u8p]
    for fn in ("seg3d_minmax_i16", "seg3d_minmax_u16", "seg3d_sub_u8",
               "seg3d_pack12_u16", "seg3d_unpack_bits"):
        getattr(lib, fn).restype = None


def _u16_view(data: np.ndarray) -> np.ndarray | None:
    """Flat little-endian uint16 view of a contiguous 2-byte array, or None
    if the layout doesn't allow a zero-copy view."""
    flat = data.reshape(-1)
    if flat.dtype.itemsize != 2 or not flat.flags.c_contiguous:
        return None
    if flat.dtype.byteorder == ">":
        return None
    return flat.view(np.uint16)


def minmax_2byte(data: np.ndarray):
    """(min, max) of a 2-byte int array via one C pass; None -> numpy path."""
    lib = get_lib()
    if lib is None:
        return None
    flat = _u16_view(data)
    if flat is None:
        return None
    lo = ctypes.c_int32()
    hi = ctypes.c_int32()
    p = flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    if data.dtype.kind == "i":
        lib.seg3d_minmax_i16(ctypes.cast(p, ctypes.POINTER(ctypes.c_int16)),
                             flat.size, ctypes.byref(lo), ctypes.byref(hi))
    else:
        lib.seg3d_minmax_u16(p, flat.size, ctypes.byref(lo), ctypes.byref(hi))
    return int(lo.value), int(hi.value)


def sub_u8(data: np.ndarray, lo: int) -> np.ndarray | None:
    """(data - lo) as uint8 in one C pass (2-byte input, span < 256)."""
    lib = get_lib()
    if lib is None:
        return None
    flat = _u16_view(data)
    if flat is None:
        return None
    out = np.empty(flat.size, np.uint8)
    lib.seg3d_sub_u8(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                     flat.size, lo & 0xFFFF,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def pack12(data: np.ndarray, lo: int) -> np.ndarray | None:
    """12-bit pack of a 2-byte array into [3, npairs] byte planes, one C
    pass. Layout documented in codec.cpp / ops/volume_pack.py."""
    lib = get_lib()
    if lib is None:
        return None
    flat = _u16_view(data)
    if flat is None:
        return None
    npairs = (flat.size + 1) // 2
    out = np.empty((3, npairs), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.seg3d_pack12_u16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        flat.size, lo & 0xFFFF,
        out[0].ctypes.data_as(u8), out[1].ctypes.data_as(u8),
        out[2].ctypes.data_as(u8))
    return out


def unpack_bits(packed: np.ndarray, bits: int) -> np.ndarray | None:
    """Inverse of ops/mask_pack.pack_mask's bit layout along the last axis:
    uint8 [..., nbytes] -> uint8 [..., nbytes * (8 // bits)], one C pass."""
    lib = get_lib()
    if lib is None or bits not in (1, 2, 4):
        return None
    p = np.ascontiguousarray(packed, np.uint8)
    vpb = 8 // bits
    out = np.empty(p.shape[:-1] + (p.shape[-1] * vpb,), np.uint8)
    lib.seg3d_unpack_bits(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        p.size, bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
