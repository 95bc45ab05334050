import numpy as np
import pytest
from scipy import ndimage

from segmentation3d_tpu.ops.geometry import Frame, frame_for_crop
from segmentation3d_tpu.ops.resample import (
    resample_to_frame, resample_spacing, crop_at_world_center,
    affine_gather_resample, LINEAR, NN, _compose_dst_to_src,
)


def _rand_vol(shape=(20, 24, 28), seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_identity_resample():
    data = _rand_vol()
    f = Frame.identity(spacing=(1, 1, 1))
    out = resample_to_frame(data, f, f, dst_size_xyz=(28, 24, 20), interp=LINEAR)
    np.testing.assert_allclose(np.asarray(out), data, atol=1e-5)


def test_shift_by_integer_voxels():
    data = _rand_vol()
    f = Frame.identity()
    dst = Frame(origin=(2.0, 3.0, 4.0), spacing=(1, 1, 1), direction=np.eye(3))
    out = np.asarray(resample_to_frame(data, f, dst, dst_size_xyz=(28, 24, 20)))
    # dst voxel (x,y,z) samples src voxel (x+2, y+3, z+4); valid region matches
    np.testing.assert_allclose(out[:16, :21, :26], data[4:, 3:, 2:], atol=1e-5)
    # out-of-range gets fill value 0
    assert np.all(out[16:] == 0)


def test_linear_vs_scipy_separable():
    data = _rand_vol((16, 16, 16))
    src = Frame.identity(spacing=(1.0, 1.0, 1.0))
    dst = Frame(origin=(0.25, 0.5, 0.75), spacing=(0.5, 0.7, 1.3), direction=np.eye(3))
    size = (12, 10, 9)
    out = np.asarray(resample_to_frame(data, src, dst, size, interp=LINEAR))
    # scipy ground truth: map dst idx -> src idx
    m = _compose_dst_to_src(src, dst)
    zz, yy, xx = np.meshgrid(np.arange(size[2]), np.arange(size[1]), np.arange(size[0]),
                             indexing="ij")
    cx = m[0, 0] * xx + m[0, 3]
    cy = m[1, 1] * yy + m[1, 3]
    cz = m[2, 2] * zz + m[2, 3]
    ref = ndimage.map_coordinates(data, [cz, cy, cx], order=1, mode="constant", cval=0.0)
    valid = ((cx >= 0) & (cx <= 15) & (cy >= 0) & (cy <= 15) & (cz >= 0) & (cz <= 15))
    ref = np.where(valid, ref, 0.0)
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-4)


def test_nn_resample_labels_preserved():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 5, size=(12, 12, 12)).astype(np.int32)
    src = Frame.identity()
    dst = Frame(origin=(0.2, 0.2, 0.2), spacing=(0.9, 0.9, 0.9), direction=np.eye(3))
    out = np.asarray(resample_to_frame(labels, src, dst, (10, 10, 10), interp=NN))
    assert out.dtype == np.int32
    assert set(np.unique(out)) <= set(np.unique(labels)) | {0}


def test_gather_path_matches_separable():
    data = _rand_vol((14, 15, 16))
    src = Frame.identity()
    dst = Frame(origin=(0.3, 0.6, 0.1), spacing=(1.3, 0.8, 1.1), direction=np.eye(3))
    size = (11, 12, 13)
    sep = np.asarray(resample_to_frame(data, src, dst, size, interp=LINEAR))
    m = _compose_dst_to_src(src, dst)
    import jax.numpy as jnp
    gat = np.asarray(affine_gather_resample(jnp.asarray(data),
                                            jnp.asarray(m[:3], np.float32),
                                            (size[2], size[1], size[0]), interp=LINEAR))
    np.testing.assert_allclose(sep, gat, atol=1e-4)


def test_rotated_direction_gather():
    """Non-axis-aligned direction goes down the gather path and round-trips."""
    data = _rand_vol((16, 16, 16))
    # 90-degree rotation around z: x->y
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    src = Frame(origin=(0, 0, 0), spacing=(1, 1, 1), direction=np.eye(3))
    dst = Frame(origin=(0, 0, 0), spacing=(1, 1, 1), direction=rot)
    m = _compose_dst_to_src(src, dst)
    assert not np.allclose(m[:3, :3], np.diag(np.diag(m[:3, :3])))
    out = np.asarray(resample_to_frame(data, src, dst, (16, 16, 16)))
    assert out.shape == (16, 16, 16)
    # dst voxel (x,y,z) lies at world (-y, x, z) -> src idx (-y, x, z): only
    # x=0 column is in-bounds (src x >= 0 needs dst y <= 0)
    np.testing.assert_allclose(out[:, 0, :], data[:, :, 0].transpose(0, 1), atol=1e-5)


def test_resample_spacing_pads():
    data = _rand_vol((20, 24, 28))
    f = Frame.identity(spacing=(0.8, 0.8, 2.0))
    out, nf, size = resample_spacing(data, f, (1, 1, 1), pad_to_multiple=16)
    assert np.all(size % 16 == 0)
    assert out.shape == (size[2], size[1], size[0])


def test_crop_center_semantics():
    """A crop centered on a voxel's world position reproduces the neighborhood."""
    data = np.zeros((21, 21, 21), np.float32)
    data[10, 10, 10] = 1.0
    f = Frame.identity()
    crop, cf = crop_at_world_center(data, f, center_world=(10, 10, 10),
                                    out_size_xyz=(5, 5, 5), out_spacing_xyz=(1, 1, 1))
    crop = np.asarray(crop)
    assert crop[2, 2, 2] == 1.0
    assert crop.sum() == 1.0


def test_multichannel_resample():
    data = np.stack([_rand_vol((10, 10, 10), s) for s in range(3)], axis=-1)  # [D,H,W,C]
    f = Frame.identity()
    dst = Frame(origin=(0.5, 0.5, 0.5), spacing=(1, 1, 1), direction=np.eye(3))
    out = np.asarray(resample_to_frame(data, f, dst, (8, 8, 8)))
    assert out.shape == (8, 8, 8, 3)
    for c in range(3):
        single = np.asarray(resample_to_frame(data[..., c], f, dst, (8, 8, 8)))
        np.testing.assert_allclose(out[..., c], single, atol=1e-5)
