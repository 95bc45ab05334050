"""First-party NIfTI-1 reader/writer (.nii / .nii.gz), numpy-only.

Replaces the reference's SimpleITK ``ReadImage``/``WriteImage`` for NIfTI
(``utils/image_tools.py`` usage throughout). Supports the scalar 3D volumes
the toolkit works with; data returned as ``[z, y, x]`` C-order arrays plus an
ITK-convention (LPS) :class:`~segmentation3d_tpu.ops.geometry.Frame`.

NIfTI affines are RAS; ITK frames are LPS — we convert with the standard
``diag(-1,-1,1)`` flip so .nii and .mha round-trips agree.
"""
from __future__ import annotations

import gzip
import os
import struct

import numpy as np

from segmentation3d_tpu.ops.geometry import Frame

_RAS2LPS = np.diag([-1.0, -1.0, 1.0])

# NIfTI datatype codes
_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
    1024: np.int64, 1280: np.uint64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


# gzip.open's default compresslevel is 9 — on this 1-core host that costs
# seconds per written volume for <1% size over level 1 on segmentation
# masks (long runs of equal labels). SEG3D_GZIP_LEVEL overrides.
_GZIP_LEVEL = int(os.environ.get("SEG3D_GZIP_LEVEL", "1"))


def _open(path, mode="rb"):
    if str(path).endswith(".gz"):
        if "w" in mode:
            return gzip.open(path, mode, compresslevel=_GZIP_LEVEL)
        return gzip.open(path, mode)
    return open(path, mode)


def read_nifti(path):
    """Read a .nii/.nii.gz file -> (data [z,y,x] (or [...,t] squeezed), Frame)."""
    with _open(path, "rb") as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            sizeof_hdr = struct.unpack(">i", hdr[0:4])[0]
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            endian = ">"
        magic = hdr[344:348]
        if magic[:2] not in (b"n+", b"ni"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
        dim = struct.unpack(endian + "8h", hdr[40:56])
        ndim = dim[0]
        shape_fortran = [max(1, d) for d in dim[1:1 + ndim]]  # (ni, nj, nk, ...)
        datatype = struct.unpack(endian + "h", hdr[70:72])[0]
        bitpix = struct.unpack(endian + "h", hdr[72:74])[0]
        pixdim = struct.unpack(endian + "8f", hdr[76:108])
        vox_offset = struct.unpack(endian + "f", hdr[108:112])[0]
        scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
        scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
        qform_code = struct.unpack(endian + "h", hdr[252:254])[0]
        sform_code = struct.unpack(endian + "h", hdr[254:256])[0]
        quats = struct.unpack(endian + "6f", hdr[256:280])
        srow = np.array(struct.unpack(endian + "12f", hdr[280:328])).reshape(3, 4)

        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dt = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
        if dt.itemsize * 8 != bitpix:
            raise ValueError(f"{path}: bitpix {bitpix} mismatches datatype {datatype}")

        f.seek(int(vox_offset))
        count = int(np.prod(shape_fortran))
        raw = f.read(count * dt.itemsize)
        data = np.frombuffer(raw, dtype=dt, count=count)

    # Fortran order on disk (i fastest) -> C array indexed [..., k, j, i]
    data = data.reshape(shape_fortran[::-1])
    # squeeze trailing singleton time/vector dims down to 3D where possible
    while data.ndim > 3 and data.shape[0] == 1:
        data = data[0]
    data = np.ascontiguousarray(data.astype(data.dtype.newbyteorder("=")))

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter

    # affine: prefer sform, then qform, then pixdim-only
    if sform_code > 0:
        aff_ras = np.eye(4)
        aff_ras[:3, :] = srow
    elif qform_code > 0:
        aff_ras = _qform_affine(quats, pixdim)
    else:
        aff_ras = np.diag([pixdim[1] or 1.0, pixdim[2] or 1.0, pixdim[3] or 1.0, 1.0])

    m_lps = _RAS2LPS @ aff_ras[:3, :3]
    origin = _RAS2LPS @ aff_ras[:3, 3]
    spacing = np.linalg.norm(m_lps, axis=0)
    spacing[spacing == 0] = 1.0
    direction = m_lps / spacing
    return data, Frame(origin, spacing, direction)


def _qform_affine(quats, pixdim):
    b, c, d, qx, qy, qz = quats
    a = float(np.sqrt(max(0.0, 1.0 - (b * b + c * c + d * d))))
    rot = np.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
        [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
        [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
    ])
    qfac = -1.0 if pixdim[0] < 0 else 1.0
    sp = np.array([pixdim[1] or 1.0, pixdim[2] or 1.0, qfac * (pixdim[3] or 1.0)])
    aff = np.eye(4)
    aff[:3, :3] = rot * sp
    aff[:3, 3] = (qx, qy, qz)
    return aff


def write_nifti(path, data, frame: Frame):
    """Write a 3D ``[z,y,x]`` array + LPS Frame as NIfTI-1 (sform, RAS)."""
    data = np.asarray(data)
    if data.ndim != 3:
        raise ValueError(f"write_nifti expects 3D [z,y,x], got {data.shape}")
    if data.dtype == np.bool_:
        data = data.astype(np.uint8)
    if data.dtype not in _CODES:
        data = data.astype(np.float32)
    dt = np.dtype(data.dtype)

    m_lps = frame.direction @ np.diag(frame.spacing)
    m_ras = _RAS2LPS @ m_lps
    origin_ras = _RAS2LPS @ frame.origin

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    nz, ny, nx = data.shape
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, _CODES[dt])
    struct.pack_into("<h", hdr, 72, dt.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, 1.0, *[float(s) for s in frame.spacing], 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)    # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)    # scl_inter
    struct.pack_into("<h", hdr, 252, 0)      # qform_code
    struct.pack_into("<h", hdr, 254, 1)      # sform_code = NIFTI_XFORM_SCANNER_ANAT
    srow = np.zeros((3, 4), np.float64)
    srow[:, :3] = m_ras
    srow[:, 3] = origin_ras
    struct.pack_into("<12f", hdr, 280, *srow.reshape(-1).astype(np.float32))
    hdr[344:348] = b"n+1\x00"

    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)  # extension flag padding to vox_offset 352
        f.write(np.ascontiguousarray(data).tobytes())
