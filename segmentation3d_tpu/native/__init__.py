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
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    # first attempt links libdeflate (the fast one-shot gzip path); hosts
    # without it fall back to a build with those symbols compiled out — the
    # rest of the codec must not be lost to a missing optional library
    for cmd in (base + ["-ldeflate"],
                base + ["-DSEG3D_DISABLE_LIBDEFLATE"]):
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
    # JPEG Lossless scan decoder (io/jpeg_lossless.py's hot loop)
    lib.seg3d_jpegll_decode.argtypes = [
        u8p, ctypes.c_size_t, u8p, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u16p]
    lib.seg3d_jpegll_decode.restype = ctypes.c_int
    # optional libdeflate-backed gzip (absent when built without the lib)
    try:
        szp = ctypes.POINTER(ctypes.c_size_t)
        lib.seg3d_gzip_bound.argtypes = [ctypes.c_size_t, ctypes.c_int]
        lib.seg3d_gzip_bound.restype = ctypes.c_size_t
        lib.seg3d_gzip_compress.argtypes = [u8p, ctypes.c_size_t,
                                            ctypes.c_int, u8p, ctypes.c_size_t]
        lib.seg3d_gzip_compress.restype = ctypes.c_size_t
        lib.seg3d_gunzip_member.argtypes = [u8p, ctypes.c_size_t, u8p,
                                            ctypes.c_size_t, szp, szp]
        lib.seg3d_gunzip_member.restype = ctypes.c_int
        lib._seg3d_has_gzip = True
    except AttributeError:
        lib._seg3d_has_gzip = False


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


def gzip_compress(payload, level: int = 1) -> bytes | None:
    """One-shot gzip of a bytes-like payload via libdeflate (measured 2-3x
    zlib on whole buffers — the write-behind thread's largest stage); None
    -> caller uses the zlib/gzip path. ``level`` is the ZLIB-scale level
    (1-9); libdeflate's scale is compatible for that range."""
    lib = get_lib()
    if lib is None or not getattr(lib, "_seg3d_has_gzip", False):
        return None
    src = np.frombuffer(payload, np.uint8) if not isinstance(
        payload, np.ndarray) else payload.reshape(-1).view(np.uint8)
    if not src.flags.c_contiguous:
        src = np.ascontiguousarray(src)
    level = min(max(int(level), 1), 12)
    cap = lib.seg3d_gzip_bound(src.size, level)
    if cap == 0:
        return None
    dst = np.empty(cap, np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    out = lib.seg3d_gzip_compress(src.ctypes.data_as(u8), src.size, level,
                                  dst.ctypes.data_as(u8), cap)
    if out == 0:
        return None
    return dst[:out].tobytes()


def gunzip(raw: bytes) -> bytes | None:
    """One-shot gunzip of a complete (possibly multi-member) .gz blob via
    libdeflate; None -> caller uses the zlib path. The first attempt sizes
    the output from the gzip ISIZE trailer (exact for <4 GiB single-member
    files — everything this framework writes); a short buffer grows and
    retries, corrupt data falls back."""
    lib = get_lib()
    if lib is None or not getattr(lib, "_seg3d_has_gzip", False):
        return None
    if len(raw) < 18:  # minimal gzip member size
        return None
    src = np.frombuffer(raw, np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    members = []
    off = 0
    n = src.size
    while off < n:
        # ISIZE of the LAST member; for the common single-member file this
        # is the exact payload size. Off-by-members/mod-2^32 cases surface
        # as INSUFFICIENT_SPACE and grow below.
        isize = int.from_bytes(raw[-4:], "little")
        cap = max(isize, 1, (n - off) * 2)
        for _ in range(3):
            dst = np.empty(cap, np.uint8)
            in_used = ctypes.c_size_t()
            out_used = ctypes.c_size_t()
            rc = lib.seg3d_gunzip_member(
                src[off:].ctypes.data_as(u8), n - off,
                dst.ctypes.data_as(u8), cap,
                ctypes.byref(in_used), ctypes.byref(out_used))
            if rc == 0:
                members.append(dst[:out_used.value].tobytes())
                off += in_used.value
                break
            if rc == 1 and cap < (1 << 34):
                cap *= 4
                continue
            if members and not src[off:].any():
                # trailing ZERO padding after decoded member(s) (block-
                # aligned archives): done. Non-zero trailing garbage could
                # be a CORRUPT further member — return None so the caller's
                # zlib path diagnoses it loudly instead of a silent
                # truncated payload.
                off = n
                break
            return None  # bad data / absurd size: let zlib diagnose
        else:
            return None
        if off < n and in_used.value == 0:
            return None
    return members[0] if len(members) == 1 else b"".join(members)


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
