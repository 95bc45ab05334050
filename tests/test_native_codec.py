"""Parity tests for the native host codec (segmentation3d_tpu/native):
every C path must produce byte-identical results to the numpy fallback it
replaces, on the same inputs — including negative int16 ranges, odd voxel
counts, and non-contiguous layouts (which must decline the fast path)."""
import numpy as np
import pytest

from segmentation3d_tpu import native
from segmentation3d_tpu.ops import mask_pack, volume_pack


def _numpy_pack(data, monkeypatch):
    """pack_volume_np with the native fast paths disabled."""
    monkeypatch.setattr(native, "minmax_2byte", lambda a: None)
    out = volume_pack.pack_volume_np(data)
    monkeypatch.undo()
    return out


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="no native toolchain available")


@needs_native
@pytest.mark.parametrize("lo,hi,dtype", [
    (-1024, 3072, np.int16),    # CT HU range -> u12
    (0, 4000, np.uint16),       # MR-style -> u12
    (-50, 200, np.int16),       # narrow -> u8
    (0, 250, np.uint16),        # narrow unsigned -> u8
    (-30000, 30000, np.int16),  # too wide -> raw passthrough
])
def test_pack_volume_native_matches_numpy(lo, hi, dtype, monkeypatch):
    rng = np.random.default_rng(42)
    for shape in [(11, 13, 15), (2, 3, 5)]:  # odd and tiny voxel counts
        data = rng.integers(lo, hi, size=shape).astype(dtype)
        got, gmeta = volume_pack.pack_volume_np(data)
        want, wmeta = _numpy_pack(data, monkeypatch)
        assert gmeta == wmeta
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@needs_native
def test_minmax_2byte():
    rng = np.random.default_rng(0)
    a = rng.integers(-32768, 32767, size=1001).astype(np.int16)
    assert native.minmax_2byte(a) == (int(a.min()), int(a.max()))
    b = rng.integers(0, 65535, size=999).astype(np.uint16)
    assert native.minmax_2byte(b) == (int(b.min()), int(b.max()))


@needs_native
def test_noncontiguous_declines():
    a = np.arange(64, dtype=np.int16).reshape(8, 8)[:, ::2]
    assert not a.flags.c_contiguous
    assert native.minmax_2byte(a) is None
    # pack_volume_np still works (numpy path) on such input
    packed, meta = volume_pack.pack_volume_np(np.ascontiguousarray(a))
    assert meta["scheme"] == "u8"


@needs_native
@pytest.mark.parametrize("num_classes", [3, 4, 5, 16])
def test_unpack_bits_matches_lut(num_classes, monkeypatch):
    rng = np.random.default_rng(7)
    bits = mask_pack.bits_for(num_classes)
    assert bits in (2, 4)
    packed = rng.integers(0, 256, size=(5, 7, 33)).astype(np.uint8)
    n_last = packed.shape[-1] * (8 // bits) - 3
    got = mask_pack.unpack_mask(packed, n_last, num_classes)
    monkeypatch.setattr(native, "unpack_bits", lambda p, b: None)
    want = mask_pack.unpack_mask(packed, n_last, num_classes)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_mask_roundtrip_through_native():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    for num_classes in (4, 9):
        m = rng.integers(0, num_classes, size=(6, 5, 41)).astype(np.uint8)
        packed = np.asarray(mask_pack.pack_mask(jnp.asarray(m), num_classes))
        out = mask_pack.unpack_mask(packed, m.shape[-1], num_classes)
        np.testing.assert_array_equal(out, m)


def test_env_disable(monkeypatch):
    """SEG3D_NATIVE=0 must force the loader to report no library."""
    monkeypatch.setenv("SEG3D_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    assert native.get_lib() is None
    # and the pack still functions via numpy
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    packed, meta = volume_pack.pack_volume_np(data)
    assert meta["scheme"] == "u8"
    monkeypatch.setattr(native, "_lib_tried", False)  # re-probe next use


def test_native_gzip_roundtrip_and_fallbacks():
    """libdeflate-backed one-shot gzip (round-4): roundtrip, zlib interop
    both directions, multi-member, trailing padding, garbage -> None."""
    import gzip
    import numpy as np
    from segmentation3d_tpu import native
    if not getattr(native.get_lib(), "_seg3d_has_gzip", False):
        import pytest
        pytest.skip("codec built without libdeflate")
    rng = np.random.default_rng(0)
    payload = rng.integers(-900, 1500, 200_000, dtype=np.int16).tobytes()
    blob = native.gzip_compress(payload, 1)
    assert blob is not None
    assert gzip.decompress(blob) == payload          # python reads ours
    assert native.gunzip(blob) == payload            # we read ours
    assert native.gunzip(gzip.compress(payload, 6)) == payload  # we read zlib's
    mm = gzip.compress(payload[:999]) + gzip.compress(payload[999:5000])
    assert native.gunzip(mm) == payload[:5000]       # multi-member
    assert native.gunzip(blob + b"\x00" * 16) == payload  # trailing padding
    assert native.gunzip(b"\x1f\x8bnot-a-real-gzip-stream") is None


def test_nifti_gz_write_read_uses_native_path(tmp_path):
    """A .nii.gz written through the one-shot writer reads back identically
    (native and pure-python readers agree)."""
    import gzip
    import numpy as np
    from segmentation3d_tpu.io import Volume, read_image, write_image
    from segmentation3d_tpu.ops.geometry import Frame
    rng = np.random.default_rng(1)
    data = rng.integers(-500, 1200, (24, 20, 16)).astype(np.int16)
    p = str(tmp_path / "v.nii.gz")
    write_image(Volume(data, Frame.identity()), p)
    with open(p, "rb") as f:
        raw = f.read()
    assert raw[:2] == b"\x1f\x8b"                    # a real gzip container
    gzip.decompress(raw)                             # python can read it
    back = read_image(p)
    np.testing.assert_array_equal(back.data, data)


def test_gunzip_corrupt_second_member_falls_back():
    """A corrupt non-final member must return None (so the caller's zlib
    path raises loudly) — never a silently truncated payload; zero padding
    after valid members stays accepted."""
    import gzip
    from segmentation3d_tpu import native
    if not getattr(native.get_lib(), "_seg3d_has_gzip", False):
        import pytest
        pytest.skip("codec built without libdeflate")
    a, b = b"x" * 1000, b"y" * 1000
    blob = gzip.compress(a) + gzip.compress(b)
    assert native.gunzip(blob) == a + b
    corrupt = gzip.compress(a) + b"\x1f\x8b" + b"\xde\xad" * 20
    assert native.gunzip(corrupt) is None
    assert native.gunzip(gzip.compress(a) + b"\x00" * 32) == a
