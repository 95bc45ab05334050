"""Reference-named utils.image_tools parity layer."""
import numpy as np

from segmentation3d_tpu.io import Volume
from segmentation3d_tpu.ops.geometry import Frame
from segmentation3d_tpu.utils import image_tools as it


def _vol(shape=(12, 14, 16), spacing=(1, 1, 1)):
    rng = np.random.default_rng(0)
    return Volume(rng.normal(size=shape).astype(np.float32),
                  Frame.identity(spacing=spacing))


def test_get_set_frame():
    v = _vol()
    f2 = Frame(origin=(1, 2, 3), spacing=(2, 2, 2), direction=np.eye(3))
    it.set_image_frame(v, f2)
    assert it.get_image_frame(v).isclose(f2)


def test_crop_image_center():
    v = _vol((21, 21, 21))
    v.data[:] = 0.0
    v.data[10, 10, 10] = 5.0
    crop = it.crop_image(v, center_world=(10, 10, 10), crop_size_xyz=(5, 5, 5),
                         crop_spacing_xyz=(1, 1, 1))
    assert crop.data.shape == (5, 5, 5)
    assert crop.data[2, 2, 2] == 5.0


def test_resample_spacing_pads_to_stride():
    v = _vol((20, 20, 20), spacing=(2, 2, 2))
    out = it.resample_spacing(v, (1, 1, 1), max_stride=16)
    assert all(s % 16 == 0 for s in out.data.shape)
    assert np.allclose(out.frame.spacing, 1.0)


def test_resample_to_frame():
    v = _vol((10, 10, 10))
    target = Frame(origin=(1, 1, 1), spacing=(1, 1, 1), direction=np.eye(3))
    out = it.resample(v, target, (8, 8, 8))
    assert out.data.shape == (8, 8, 8)
    np.testing.assert_allclose(out.data, v.data[1:9, 1:9, 1:9], atol=1e-4)


def test_partition_by_fixed_size():
    v = _vol((64, 64, 64))
    boxes = it.image_partition_by_fixed_size(v, (32, 32, 32), (32, 32, 32))
    assert len(boxes) == 8
    start, end = boxes[0]
    assert tuple(end - start) == (32, 32, 32)


def test_tensor_conversions():
    v = _vol((4, 5, 6))
    t = it.convert_image_to_tensor(v)
    assert t.shape == (4, 5, 6, 1)
    t2 = it.convert_image_to_tensor([v, v])
    assert t2.shape == (4, 5, 6, 2)
    back = it.convert_tensor_to_image(np.asarray(t), v.frame)
    np.testing.assert_allclose(back.data, v.data)
    multi = it.convert_tensor_to_image(np.asarray(t2), v.frame)
    assert isinstance(multi, list) and len(multi) == 2


def test_copy_image_is_deep():
    v = _vol()
    c = it.copy_image(v)
    c.data[0, 0, 0] = 123.0
    assert v.data[0, 0, 0] != 123.0
