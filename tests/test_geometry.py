import numpy as np
import pytest

from segmentation3d_tpu.ops.geometry import (
    Frame, frame_for_crop, resampled_frame, partition_boxes,
)


def test_frame_roundtrip_identity():
    f = Frame.identity(spacing=(0.5, 1.0, 2.0), origin=(10.0, -5.0, 3.0))
    idx = np.array([[0, 0, 0], [3, 4, 5]], np.float64)
    w = f.index_to_world(idx)
    assert np.allclose(w[0], [10, -5, 3])
    assert np.allclose(w[1], [10 + 1.5, -5 + 4, 3 + 10])
    back = f.world_to_index(w)
    assert np.allclose(back, idx)


def test_frame_roundtrip_rotated():
    rng = np.random.default_rng(0)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    f = Frame(origin=(1, 2, 3), spacing=(0.7, 1.1, 2.3), direction=q)
    idx = rng.uniform(0, 50, size=(10, 3))
    assert np.allclose(f.world_to_index(f.index_to_world(idx)), idx, atol=1e-9)


def test_frame_dict_roundtrip():
    f = Frame(origin=(1, 2, 3), spacing=(0.5, 0.5, 2.0), direction=np.eye(3))
    f2 = Frame.from_dict(f.to_dict())
    assert f.isclose(f2)


def test_frame_for_crop_centering():
    f = Frame.identity(spacing=(1, 1, 1))
    center = np.array([20.0, 30.0, 40.0])
    cf = frame_for_crop(f, center, out_size_xyz=(9, 9, 9), out_spacing_xyz=(2, 2, 2))
    # continuous-index center of the crop must land on center
    assert np.allclose(cf.index_to_world([4, 4, 4]), center)


def test_resampled_frame_pads_to_multiple():
    f = Frame.identity(spacing=(0.8, 0.8, 2.5))
    nf, size = resampled_frame(f, size_xyz=(100, 100, 40), new_spacing_xyz=(1, 1, 1),
                               pad_to_multiple=16)
    assert np.all(size % 16 == 0)
    assert np.all(size * 1.0 >= np.array([80, 80, 100]) - 1e-6)
    assert np.allclose(nf.spacing, 1.0)
    assert np.allclose(nf.origin, f.origin)


def test_partition_boxes_cover_and_clamp():
    starts = partition_boxes((256, 256, 256), (96, 96, 96), (64, 64, 64))
    per_axis = sorted(set(starts[:, 0]))
    assert per_axis == [0, 64, 128, 160]  # last start clamped to 256-96
    assert starts.shape == (4 ** 3, 3)
    # full coverage
    covered = np.zeros(256, bool)
    for s in per_axis:
        covered[s:s + 96] = True
    assert covered.all()


def test_partition_boxes_exact_fit():
    starts = partition_boxes((96, 96, 96), (96, 96, 96), (64, 64, 64))
    assert starts.shape == (1, 3)
    assert np.all(starts == 0)


def test_partition_rejects_oversize():
    with pytest.raises(ValueError):
        partition_boxes((64, 64, 64), (96, 96, 96), (64, 64, 64))
