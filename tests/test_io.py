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
