"""Narrow-bit-width packing of stored volumes for the host->device upload.

The end-to-end inference path is H2D-BYTE-BOUND on this host (BASELINE.md:
the axon relay link moves ~20-25 MB/s and a 384^3 int16 CT is 113 MB, so the
4.9 s/case steady state IS the transfer). Stored CT is int16 on disk but its
value RANGE almost always fits 12 bits (HU -1024..3071) — and many masks /
MR series fit 8. Packing on the read-ahead thread (host numpy, overlapped
with the transfer of the previous case) and unpacking on device INSIDE the
already-fused preprocess program (``core.seg_infer._prep_modality`` — no
extra compiled program, program COUNT is a first-order cost on the relay)
cuts upload bytes 25% (12-bit) or 50% (8-bit) essentially for free.

Pairs-of-voxels layout for the 12-bit scheme: values ``a, b`` become bytes
``[a & 0xFF, (a >> 8) | ((b & 0xF) << 4), b >> 4]`` stored as three planes
``packed[0..2, i]`` so the device unpack is three aligned vector loads.

Schemes:
  - ``"raw"``: pass-through (float data, or integer range >= 4096);
  - ``"u8"``: ``uint8(v - lo)``, integer range < 256;
  - ``"u12"``: the 3-bytes-per-2-voxels layout above, integer range < 4096.

Reference parity note: the reference (SURVEY.md §3.2, ``segmentation3d/
core/seg_infer.py`` ≈L270-340) reads with SimpleITK and moves float32
tensors to the GPU over PCIe — transfer packing has no analog there; this
module exists because the TPU path makes the host link explicit.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

#: integer dtypes eligible for narrow packing
_INT_DTYPES = (np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32)


def _sub_u16(data: np.ndarray, lo: int) -> np.ndarray:
    """``(data - lo)`` as a flat uint16 array WITHOUT an int32 temporary.

    For 2-byte int dtypes the subtraction runs modulo 2^16 on a uint16
    VIEW — exact whenever the true difference fits [0, 65535] (callers
    guarantee span < 4096). 4-byte ints (rare) take the cast path. This
    matters because the pack runs per case on this 1-CORE host: the old
    int32 formulation made ~5 full-volume 4-byte passes and profiled at
    4.3 s per 384^3 case — longer than the H2D transfer it feeds."""
    flat = data.reshape(-1)
    if flat.dtype.itemsize == 2:
        if flat.dtype.byteorder == ">":
            flat = flat.astype(flat.dtype.newbyteorder("<"))
        return flat.view(np.uint16) - np.uint16(lo & 0xFFFF)
    return (flat - lo).astype(np.uint16)


def pack_volume_np(data: np.ndarray):
    """Pack a stored volume for upload. Returns ``(packed, meta)`` where
    ``meta = {"scheme", "lo", "shape"}``; ``packed`` is what to
    ``jax.device_put`` and :func:`unpack_volume` inverts it on device.

    Host cost is one or two single passes over the volume when the native
    codec is available (``native/codec.cpp`` — ~6x fewer memory passes than
    the numpy formulation on the common int16-CT case), else a few
    uint8/uint16 numpy vector passes (runs on the read-ahead thread,
    overlapped with the previous case's transfer)."""
    from segmentation3d_tpu import native

    shape = tuple(int(s) for s in data.shape)
    if data.dtype.type not in _INT_DTYPES:
        return data, {"scheme": "raw", "lo": 0, "shape": shape}
    mm = None
    if data.dtype.itemsize == 2:
        mm = native.minmax_2byte(data)
    if mm is not None:
        lo, hi = mm
        span = hi - lo
    else:
        lo = int(data.min())
        span = int(data.max()) - lo  # values fit [0, span]
    if span < 256:
        if mm is not None:
            out = native.sub_u8(data, lo)
            if out is not None:
                return out, {"scheme": "u8", "lo": lo, "shape": shape}
        return _sub_u16(data, lo).astype(np.uint8), \
            {"scheme": "u8", "lo": lo, "shape": shape}
    if span < 4096:
        if mm is not None:
            packed = native.pack12(data, lo)
            if packed is not None:
                return packed, {"scheme": "u12", "lo": lo, "shape": shape}
        u = _sub_u16(data, lo)
        if u.size % 2:
            u = np.concatenate([u, u[-1:]])
        # little-endian byte planes per voxel pair (a, b):
        #   B[:, 0] = a & 0xFF   B[:, 1] = a >> 8 (<= 0x0F)
        #   B[:, 2] = b & 0xFF   B[:, 3] = b >> 8 (<= 0x0F)
        B = u.view(np.uint8).reshape(-1, 4)
        packed = np.empty((3, B.shape[0]), np.uint8)
        packed[0] = B[:, 0]
        np.left_shift(B[:, 2], 4, out=packed[1])   # (b & 0xF) << 4 (mod 256)
        packed[1] |= B[:, 1]                       # | (a >> 8)
        np.right_shift(B[:, 2], 4, out=packed[2])  # (b >> 4) & 0xF
        packed[2] |= np.left_shift(B[:, 3], 4)     # | ((b >> 8) << 4)
        return packed, {"scheme": "u12", "lo": lo, "shape": shape}
    return data, {"scheme": "raw", "lo": 0, "shape": shape}


def unpack_volume(packed, *, scheme: str, shape, lo):
    """Device-side inverse of :func:`pack_volume_np` -> float32 volume.

    Traceable; ``scheme``/``shape`` are static (they fork compilations like
    any shape does), ``lo`` must be a TRACED scalar so per-case intensity
    ranges don't fork one program each."""
    if scheme == "raw":
        return jnp.asarray(packed).astype(jnp.float32)
    lo = jnp.asarray(lo, jnp.float32)
    nvox = 1
    for s in shape:
        nvox *= int(s)
    if scheme == "u8":
        return packed.reshape(shape).astype(jnp.float32) + lo
    if scheme == "u12":
        p = packed.astype(jnp.int32)
        a = p[0] | ((p[1] & 0xF) << 8)
        b = (p[1] >> 4) | (p[2] << 4)
        flat = jnp.stack([a, b], axis=1).reshape(-1)[:nvox]
        return flat.reshape(shape).astype(jnp.float32) + lo
    raise ValueError(f"unknown pack scheme {scheme!r}")
