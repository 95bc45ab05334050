"""Minimal DICOM series reader (CT/MR volumes), numpy-only.

Covers the reference's ``utils/dicom_helper.py`` capability (SURVEY.md C15
[L]): read a folder of single-frame DICOM slices into one volume + frame.

Supported: DICM part-10 files, explicit/implicit VR little endian, native
(uncompressed) PixelData, MONOCHROME photometric interpretation. Slices are
sorted by ImagePositionPatient along the slice normal; rescale slope/intercept
applied. Compressed transfer syntaxes raise a clear error.
"""
from __future__ import annotations

import os
import struct

import numpy as np

from segmentation3d_tpu.ops.geometry import Frame

# (group, element) tags
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOC = (0x0028, 0x0100)
TAG_PIXEL_REPR = (0x0028, 0x0103)
TAG_SPACING = (0x0028, 0x0030)
TAG_POSITION = (0x0020, 0x0032)
TAG_ORIENTATION = (0x0020, 0x0037)
TAG_SLOPE = (0x0028, 0x1053)
TAG_INTERCEPT = (0x0028, 0x1052)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)
TAG_SERIES_UID = (0x0020, 0x000E)
TAG_INSTANCE_NUMBER = (0x0020, 0x0013)

_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN", b"OD", b"OL", b"UC", b"UR"}
_UNCOMPRESSED = {
    "1.2.840.10008.1.2",        # implicit VR LE
    "1.2.840.10008.1.2.1",      # explicit VR LE
}


def _parse_elements(buf: bytes, start: int, explicit: bool, stop_tag=TAG_PIXEL_DATA):
    """Yield ((group, elem), value_bytes); stops after pixel data."""
    pos = start
    n = len(buf)
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        pos += 4
        if explicit and group != 0xFFFE:
            vr = buf[pos:pos + 2]
            if vr in _EXPLICIT_LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", buf, pos + 2)[0]
                pos += 4
        else:
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("undefined-length (compressed/sequence) element "
                             "not supported by the minimal DICOM reader")
        value = buf[pos:pos + length]
        pos += length
        yield (group, elem), value
        if (group, elem) == stop_tag:
            return


def _read_file(path: str) -> dict:
    with open(path, "rb") as f:
        buf = f.read()
    elems = {}
    if buf[128:132] == b"DICM":
        # file meta group is always explicit VR LE
        pos = 132
        transfer = "1.2.840.10008.1.2.1"
        for tag, val in _parse_elements(buf, pos, explicit=True, stop_tag=(0xFFFF, 0xFFFF)):
            if tag[0] == 0x0002:
                elems[tag] = val
                if tag == TAG_TRANSFER_SYNTAX:
                    transfer = val.decode("ascii", "ignore").strip("\x00 ").strip()
            else:
                break
        if transfer not in _UNCOMPRESSED:
            raise ValueError(f"{path}: compressed transfer syntax {transfer} unsupported")
        # find where group 0002 ends: re-scan body from after the meta group
        meta_len = None
        for tag, val in _parse_elements(buf, 132, explicit=True, stop_tag=(0xFFFF, 0xFFFF)):
            if tag == (0x0002, 0x0000):
                meta_len = struct.unpack("<I", val)[0]
                break
        if meta_len is not None:
            body_start = 132
            # skip the (0002,0000) element itself: tag(4)+VR(2)+len(2)+4
            body_start = 132 + 12 + meta_len
        else:
            raise ValueError(f"{path}: missing file meta group length")
        explicit = transfer != "1.2.840.10008.1.2"
    else:
        body_start = 0
        explicit = False
    for tag, val in _parse_elements(buf, body_start, explicit=explicit):
        elems[tag] = val
    return elems


def _decode(elems: dict, tag, kind, default=None):
    if tag not in elems:
        return default
    raw = elems[tag]
    if kind == "str":
        return raw.decode("ascii", "ignore").strip("\x00 ").strip()
    if kind == "floats":
        s = raw.decode("ascii", "ignore").strip("\x00 ")
        return [float(v) for v in s.split("\\") if v.strip()]
    if kind == "int":
        if len(raw) == 2:
            return struct.unpack("<H", raw)[0]
        if len(raw) == 4:
            return struct.unpack("<I", raw)[0]
        return int(raw.decode("ascii", "ignore").strip("\x00 ") or 0)
    raise ValueError(kind)


def read_dicom_series(folder: str):
    """Read all DICOM slices in ``folder`` -> (data [z,y,x], Frame)."""
    files = []
    for fn in sorted(os.listdir(folder)):
        p = os.path.join(folder, fn)
        if not os.path.isfile(p):
            continue
        try:
            with open(p, "rb") as f:
                head = f.read(132)
            if head[128:132] == b"DICM":
                files.append(p)
        except OSError:
            continue
    if not files:
        raise ValueError(f"{folder}: no DICOM files found")

    slices = []
    for p in files:
        e = _read_file(p)
        rows = _decode(e, TAG_ROWS, "int")
        cols = _decode(e, TAG_COLS, "int")
        bits = _decode(e, TAG_BITS_ALLOC, "int", 16)
        signed = _decode(e, TAG_PIXEL_REPR, "int", 0) == 1
        spacing_rc = _decode(e, TAG_SPACING, "floats", [1.0, 1.0])  # row, col
        pos = _decode(e, TAG_POSITION, "floats", [0.0, 0.0, 0.0])
        orient = _decode(e, TAG_ORIENTATION, "floats",
                         [1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
        slope = _decode(e, TAG_SLOPE, "floats", [1.0])[0]
        intercept = _decode(e, TAG_INTERCEPT, "floats", [0.0])[0]
        raw = e.get(TAG_PIXEL_DATA)
        if raw is None:
            continue
        dtype = {8: np.int8 if signed else np.uint8,
                 16: np.int16 if signed else np.uint16,
                 32: np.int32 if signed else np.uint32}[bits]
        img = np.frombuffer(raw, dtype=dtype, count=rows * cols).reshape(rows, cols)
        img = img.astype(np.float32) * slope + intercept
        slices.append({"img": img, "pos": np.asarray(pos), "orient": orient,
                       "spacing_rc": spacing_rc})

    if not slices:
        raise ValueError(f"{folder}: no readable DICOM slices")
    o = slices[0]["orient"]
    row_dir = np.asarray(o[:3])   # direction of increasing column index (x)
    col_dir = np.asarray(o[3:])   # direction of increasing row index (y)
    normal = np.cross(row_dir, col_dir)
    slices.sort(key=lambda s: float(np.dot(s["pos"], normal)))

    data = np.stack([s["img"] for s in slices], axis=0)  # [z, rows, cols]
    sp_rc = slices[0]["spacing_rc"]
    if len(slices) > 1:
        zs = [float(np.dot(s["pos"], normal)) for s in slices]
        dz = float(np.median(np.diff(zs)))
    else:
        dz = 1.0
    origin = slices[0]["pos"]
    # Frame direction columns = x (col index), y (row index), z (slice) axes
    direction = np.stack([row_dir, col_dir, normal], axis=1)
    spacing = np.asarray([sp_rc[1], sp_rc[0], abs(dz)])
    return data, Frame(origin, spacing, direction)
