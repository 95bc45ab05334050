import numpy as np
import pytest

from segmentation3d_tpu.io import Volume, read_image, write_image
from segmentation3d_tpu.ops.geometry import Frame


def _vol(dtype=np.float32, shape=(5, 6, 7)):
    rng = np.random.default_rng(42)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, size=shape).astype(dtype)
    else:
        data = rng.normal(size=shape).astype(dtype)
    frame = Frame(origin=(1.5, -2.0, 3.25), spacing=(0.5, 0.75, 2.0), direction=np.eye(3))
    return Volume(data, frame)


@pytest.mark.parametrize("ext", [".nii", ".nii.gz", ".mha"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip(tmp_path, ext, dtype):
    v = _vol(dtype)
    p = tmp_path / f"vol{ext}"
    write_image(v, p)
    v2 = read_image(p)
    assert v2.data.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(v2.data, v.data)
    assert v2.frame.isclose(v.frame)


def test_cross_format_frame_agreement(tmp_path):
    """The same volume written as .nii and .mha must read back identically
    (LPS convention consistency between the two writers)."""
    v = _vol(np.float32)
    write_image(v, tmp_path / "a.nii.gz")
    write_image(v, tmp_path / "a.mha")
    a = read_image(tmp_path / "a.nii.gz")
    b = read_image(tmp_path / "a.mha")
    np.testing.assert_allclose(a.data, b.data)
    assert a.frame.isclose(b.frame, tol=1e-4)


def test_roundtrip_with_direction(tmp_path):
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    v = Volume(rng.normal(size=(4, 5, 6)).astype(np.float32),
               Frame(origin=(0, 1, 2), spacing=(1, 2, 3), direction=q))
    for ext in (".nii", ".mha"):
        p = tmp_path / f"d{ext}"
        write_image(v, p)
        v2 = read_image(p)
        assert v2.frame.isclose(v.frame, tol=1e-4), ext
        np.testing.assert_allclose(v2.data, v.data)


def test_size_xyz():
    v = _vol(shape=(5, 6, 7))  # [z,y,x]
    assert tuple(v.size_xyz) == (7, 6, 5)  # (nx, ny, nz)


def test_compressed_mha(tmp_path):
    from segmentation3d_tpu.io.mha import write_mha, read_mha
    v = _vol(np.int16)
    write_mha(tmp_path / "c.mha", v.data, v.frame, compress=True)
    data, frame = read_mha(tmp_path / "c.mha")
    np.testing.assert_array_equal(data, v.data)
    assert frame.isclose(v.frame, tol=1e-6)


@pytest.mark.parametrize("name", ["p.hdr", "p.img", "p.img.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_hdr_img_pair_roundtrip(tmp_path, name, dtype):
    """Two-file .hdr/.img pairs (NIfTI-1 'ni1' flavor): write via any of the
    three path spellings, read back via either side, frame preserved."""
    v = _vol(dtype)
    write_image(v, tmp_path / name)
    assert (tmp_path / "p.hdr").exists()
    img = "p.img.gz" if name.endswith(".gz") else "p.img"
    assert (tmp_path / img).exists()
    for side in ("p.hdr", img):
        v2 = read_image(tmp_path / side)
        assert v2.data.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(v2.data, v.data)
        assert v2.frame.isclose(v.frame, tol=1e-4)


def test_hdr_img_pair_direction(tmp_path):
    """ni1 pairs carry the full sform: a rotated frame survives."""
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    v = Volume(rng.normal(size=(4, 5, 6)).astype(np.float32),
               Frame(origin=(0, 1, 2), spacing=(1, 2, 3), direction=q))
    write_image(v, tmp_path / "d.hdr")
    v2 = read_image(tmp_path / "d.hdr")
    assert v2.frame.isclose(v.frame, tol=1e-4)
    np.testing.assert_allclose(v2.data, v.data)


def test_plain_analyze75_read(tmp_path):
    """A plain Analyze 7.5 header (zero magic, no sform/qform) reads with
    pixdim spacing, identity direction, origin 0 — the reference
    (SimpleITK) behavior for legacy Analyze files."""
    import struct
    rng = np.random.default_rng(7)
    data = rng.integers(-200, 300, size=(3, 4, 5)).astype(np.int16)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 5, 4, 3, 1, 1, 1, 1)  # nx,ny,nz
    struct.pack_into("<h", hdr, 70, 4)   # int16
    struct.pack_into("<h", hdr, 72, 16)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, 0.5, 0.75, 2.0, 1.0, 1.0, 1.0, 1.0)
    (tmp_path / "a.hdr").write_bytes(bytes(hdr))  # magic stays zeros
    (tmp_path / "a.img").write_bytes(data.tobytes())
    v = read_image(tmp_path / "a.hdr")
    np.testing.assert_array_equal(v.data, data)
    np.testing.assert_allclose(v.frame.spacing, (0.5, 0.75, 2.0))
    np.testing.assert_allclose(v.frame.direction, np.eye(3))
    np.testing.assert_allclose(v.frame.origin, (0, 0, 0))


def test_hdr_missing_img_errors(tmp_path):
    v = _vol(np.int16)
    write_image(v, tmp_path / "m.hdr")
    (tmp_path / "m.img").unlink()
    with pytest.raises(FileNotFoundError):
        read_image(tmp_path / "m.hdr")


# ---------------------------------------------------------------------------
# NRRD (.nrrd / .nhdr) — io/nrrd.py
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ext", [".nrrd", ".nhdr"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_nrrd_roundtrip(tmp_path, ext, dtype):
    v = _vol(dtype)
    p = tmp_path / f"vol{ext}"
    write_image(v, p)
    if ext == ".nhdr":
        assert (tmp_path / "vol.raw").exists()  # detached raw data file
    v2 = read_image(p)
    assert v2.data.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(v2.data, v.data)
    assert v2.frame.isclose(v.frame, tol=1e-6)


def test_nrrd_cross_format_frame_agreement(tmp_path):
    v = _vol(np.float32)
    write_image(v, tmp_path / "a.nii.gz")
    write_image(v, tmp_path / "a.nrrd")
    a = read_image(tmp_path / "a.nii.gz")
    b = read_image(tmp_path / "a.nrrd")
    np.testing.assert_allclose(a.data, b.data)
    assert a.frame.isclose(b.frame, tol=1e-4)


def test_nrrd_direction_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    v = Volume(rng.normal(size=(4, 5, 6)).astype(np.float32),
               Frame(origin=(0, 1, 2), spacing=(1, 2, 3), direction=q))
    write_image(v, tmp_path / "d.nrrd")
    v2 = read_image(tmp_path / "d.nrrd")
    assert v2.frame.isclose(v.frame, tol=1e-6)
    np.testing.assert_allclose(v2.data, v.data)


def test_nrrd_detached_gzip(tmp_path):
    from segmentation3d_tpu.io.nrrd import write_nrrd
    v = _vol(np.int16)
    write_nrrd(tmp_path / "g.nhdr", v.data, v.frame, compress=True)
    assert (tmp_path / "g.raw.gz").exists()
    v2 = read_image(tmp_path / "g.nhdr")
    np.testing.assert_array_equal(v2.data, v.data)
    assert v2.frame.isclose(v.frame, tol=1e-6)


def test_nrrd_ras_space_converts_to_lps(tmp_path):
    """A hand-written RAS-space NRRD (what Slicer saves by default) must read
    into the LPS world frame used everywhere else: world x/y components of
    origin and directions flip sign (matching ITK's NRRD reader)."""
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    hdr = "\n".join([
        "NRRD0004",
        "type: short",
        "dimension: 3",
        "space: right-anterior-superior",
        "sizes: 4 3 2",
        "space directions: (0.5,0,0) (0,0.75,0) (0,0,2)",
        "kinds: domain domain domain",
        "endian: little",
        "encoding: raw",
        "space origin: (10,-20,30)",
    ]) + "\n\n"
    (tmp_path / "ras.nrrd").write_bytes(hdr.encode() + data.tobytes())
    v = read_image(tmp_path / "ras.nrrd")
    np.testing.assert_array_equal(v.data, data)
    np.testing.assert_allclose(v.frame.origin, (-10, 20, 30))
    np.testing.assert_allclose(v.frame.spacing, (0.5, 0.75, 2.0))
    np.testing.assert_allclose(v.frame.direction, np.diag([-1.0, -1.0, 1.0]))


def test_nrrd_big_endian_and_ascii(tmp_path):
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    hdr = "\n".join([
        "NRRD0001", "type: short", "dimension: 3", "sizes: 4 3 2",
        "spacings: 1 1 1", "endian: big", "encoding: raw",
    ]) + "\n\n"
    (tmp_path / "be.nrrd").write_bytes(hdr.encode() + data.byteswap().tobytes())
    v = read_image(tmp_path / "be.nrrd")
    assert v.data.dtype == np.int16 and v.data.dtype.byteorder in ("=", "<", "|")
    np.testing.assert_array_equal(v.data, data)

    ahdr = "\n".join([
        "NRRD0001", "type: short", "dimension: 3", "sizes: 4 3 2",
        "encoding: ascii",
    ]) + "\n\n"
    body = " ".join(str(int(x)) for x in data.ravel())
    (tmp_path / "a.nrrd").write_bytes(ahdr.encode() + body.encode())
    v2 = read_image(tmp_path / "a.nrrd")
    np.testing.assert_array_equal(v2.data, data)


def test_nrrd_byteskip_minus_one(tmp_path):
    """byte skip: -1 (raw only): payload is the LAST count*itemsize bytes —
    the convention DICOM-to-NRRD converters use for header-prefixed blobs."""
    data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    hdr = "\n".join([
        "NRRD0001", "type: uint8", "dimension: 3", "sizes: 4 3 2",
        "encoding: raw", "byte skip: -1",
    ]) + "\n\n"
    (tmp_path / "s.nrrd").write_bytes(hdr.encode() + b"JUNKJUNK" + data.tobytes())
    v = read_image(tmp_path / "s.nrrd")
    np.testing.assert_array_equal(v.data, data)


def test_nrrd_rejects_unknown(tmp_path):
    (tmp_path / "x.nrrd").write_bytes(b"NOTNRRD\n")
    with pytest.raises(ValueError, match="not a NRRD"):
        read_image(tmp_path / "x.nrrd")
    hdr = "\n".join([
        "NRRD0001", "type: short", "dimension: 3", "sizes: 4 3 2",
        "encoding: hex",
    ]) + "\n\n"
    (tmp_path / "h.nrrd").write_bytes(hdr.encode() + b"00" * 48)
    with pytest.raises(ValueError, match="encoding"):
        read_image(tmp_path / "h.nrrd")


def test_nrrd_line_skip(tmp_path):
    """'line skip: N' skips N text lines of the data block before decoding
    (applied before byte skip, per the spec)."""
    data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    hdr = "\n".join([
        "NRRD0001", "type: uint8", "dimension: 3", "sizes: 4 3 2",
        "encoding: raw", "line skip: 2",
    ]) + "\n\n"
    (tmp_path / "l.nrrd").write_bytes(
        hdr.encode() + b"comment line\nanother\n" + data.tobytes())
    v = read_image(tmp_path / "l.nrrd")
    np.testing.assert_array_equal(v.data, data)
    # combined with byte skip: lines first, then bytes
    hdr2 = hdr.replace("line skip: 2", "line skip: 1\nbyte skip: 4")
    (tmp_path / "lb.nrrd").write_bytes(
        hdr2.encode() + b"junk\nXXXX" + data.tobytes())
    v2 = read_image(tmp_path / "lb.nrrd")
    np.testing.assert_array_equal(v2.data, data)


def test_nrrd_multifile_list_rejected(tmp_path):
    hdr = "\n".join([
        "NRRD0001", "type: uint8", "dimension: 3", "sizes: 4 3 2",
        "encoding: raw", "data file: LIST",
    ]) + "\nslice0.raw\nslice1.raw\n"
    (tmp_path / "m.nhdr").write_bytes(hdr.encode())
    with pytest.raises(ValueError, match="multi-file"):
        read_image(tmp_path / "m.nhdr")


def test_nrrd_detached_filename_with_space(tmp_path):
    data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    (tmp_path / "my data.raw").write_bytes(data.tobytes())
    hdr = "\n".join([
        "NRRD0001", "type: uint8", "dimension: 3", "sizes: 4 3 2",
        "encoding: raw", "data file: my data.raw",
    ]) + "\n"
    (tmp_path / "sp.nhdr").write_bytes(hdr.encode())
    v = read_image(tmp_path / "sp.nhdr")
    np.testing.assert_array_equal(v.data, data)


def test_img_gz_named_explicitly_wins(tmp_path):
    """read_image('x.img.gz') must read the named file even when a stale
    sibling x.img exists."""
    import gzip as _gzip
    from segmentation3d_tpu.ops.geometry import Frame
    from segmentation3d_tpu.io import write_image, Volume
    good = np.full((4, 4, 4), 7, np.int16)
    stale = np.zeros((4, 4, 4), np.int16)
    write_image(Volume(good, Frame.identity()), tmp_path / "x.hdr")  # pair
    # compress the good .img to .img.gz, then overwrite .img with stale data
    raw = (tmp_path / "x.img").read_bytes()
    (tmp_path / "x.img.gz").write_bytes(_gzip.compress(raw))
    from segmentation3d_tpu.io import read_image as _ri
    write_image(Volume(stale, Frame.identity()), tmp_path / "x.hdr")
    v = _ri(tmp_path / "x.img.gz")
    np.testing.assert_array_equal(v.data, good)
    v2 = _ri(tmp_path / "x.img")          # the named .img = stale data
    np.testing.assert_array_equal(v2.data, stale)


@pytest.mark.parametrize("compress", [False, True])
def test_mhd_writes_detached_raw(tmp_path, compress):
    """.mhd output follows the ITK convention: a text header referencing a
    detached <base>.raw/.zraw data file (never inline LOCAL data), and the
    pair reads back identically."""
    import os
    from segmentation3d_tpu.io.mha import write_mha, read_mha
    v = _vol(np.int16)
    p = tmp_path / "vol.mhd"
    write_mha(p, v.data, v.frame, compress=compress)
    sidecar = "vol.zraw" if compress else "vol.raw"
    header = p.read_bytes()
    assert f"ElementDataFile = {sidecar}".encode() in header
    assert b"LOCAL" not in header
    assert os.path.isfile(tmp_path / sidecar)
    data, frame = read_mha(p)
    np.testing.assert_array_equal(data, v.data)
    assert v.frame.isclose(frame)


def test_nifti_nan_scl_slope_means_unscaled(tmp_path):
    """scl_slope=NaN (written by several tools; nibabel treats it as 'no
    scaling') must not NaN the volume."""
    import struct
    from segmentation3d_tpu.io import Volume, read_image, write_image
    from segmentation3d_tpu.ops.geometry import Frame
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "nan_slope.nii")
    write_image(Volume(data, Frame.identity()), p)
    blob = bytearray(open(p, "rb").read())
    struct.pack_into("<f", blob, 112, float("nan"))  # scl_slope
    struct.pack_into("<f", blob, 116, float("nan"))  # scl_inter
    open(p, "wb").write(bytes(blob))
    back = read_image(p)
    assert np.isfinite(back.data).all()
    np.testing.assert_array_equal(np.asarray(back.data, np.int16), data)


def test_nifti_invalid_slope_ignores_intercept(tmp_path):
    """A zero/NaN scl_slope invalidates the WHOLE scl transform (nibabel
    semantics): a finite nonzero scl_inter must NOT be applied with an
    implied slope of 1 (round-4 ADVICE)."""
    import struct
    from segmentation3d_tpu.io import Volume, read_image, write_image
    from segmentation3d_tpu.ops.geometry import Frame
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    for slope in (float("nan"), 0.0):
        p = str(tmp_path / f"slope_{slope}.nii")
        write_image(Volume(data, Frame.identity()), p)
        blob = bytearray(open(p, "rb").read())
        struct.pack_into("<f", blob, 112, slope)   # scl_slope invalid
        struct.pack_into("<f", blob, 116, 100.0)   # scl_inter finite nonzero
        open(p, "wb").write(bytes(blob))
        back = read_image(p)
        np.testing.assert_array_equal(np.asarray(back.data, np.int16), data)


def test_mha_multichannel_rejected(tmp_path):
    """A multi-channel MetaImage raises instead of silently misreading the
    interleaved samples as a scrambled scalar volume."""
    from segmentation3d_tpu.io.mha import read_mha
    p = str(tmp_path / "rgb.mha")
    hdr = ("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
           "ElementNumberOfChannels = 3\nElementType = MET_UCHAR\n"
           "ElementDataFile = LOCAL\n")
    with open(p, "wb") as f:
        f.write(hdr.encode() + bytes(range(24)))
    with pytest.raises(ValueError, match="Channels"):
        read_mha(p)
