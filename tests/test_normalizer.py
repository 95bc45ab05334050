import numpy as np

from segmentation3d_tpu.utils.normalizer import (
    FixedNormalizer, AdaptiveNormalizer, normalizer_from_dict,
)


def test_fixed_normalizer():
    n = FixedNormalizer(mean=100.0, stddev=50.0, clip=True)
    x = np.array([100.0, 150.0, 300.0, -100.0], np.float32)
    out = np.asarray(n(x))
    np.testing.assert_allclose(out, [0.0, 1.0, 1.0, -1.0], atol=1e-6)


def test_fixed_normalizer_noclip():
    n = FixedNormalizer(mean=0.0, stddev=2.0, clip=False)
    out = np.asarray(n(np.array([4.0, -6.0], np.float32)))
    np.testing.assert_allclose(out, [2.0, -3.0], atol=1e-6)


def test_adaptive_normalizer_range():
    rng = np.random.default_rng(0)
    x = rng.normal(100.0, 20.0, size=(32, 32, 32)).astype(np.float32)
    n = AdaptiveNormalizer(min_p=0.001, max_p=0.999, clip=True)
    out = np.asarray(n(x))
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # interior values map linearly: median should be near 0
    assert abs(np.median(out)) < 0.1


def test_dict_roundtrip():
    for n in (FixedNormalizer(10, 5, False), AdaptiveNormalizer(0.01, 0.99, True)):
        n2 = normalizer_from_dict(n.to_dict())
        assert type(n2) is type(n)
        x = np.random.default_rng(1).normal(10, 5, size=(100,)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(n(x)), np.asarray(n2(x)), atol=1e-6)


def test_components():
    from segmentation3d_tpu.ops.components import (
        pick_largest_connected_component, remove_small_connected_component,
    )
    m = np.zeros((10, 10, 10), np.int32)
    m[1:4, 1:4, 1:4] = 1   # 27 voxels
    m[7:9, 7:9, 7:9] = 1   # 8 voxels (separate)
    out = pick_largest_connected_component(m)
    assert out.sum() == 27
    out2 = remove_small_connected_component(m, threshold=10)
    assert out2.sum() == 27
    out3 = remove_small_connected_component(m, threshold=100)
    assert out3.sum() == 0
