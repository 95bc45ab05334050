"""Spatially-sharded single-volume inference (halo exchange) tests.

Run on the 8 virtual CPU devices from conftest. The load-bearing property:
z-sharding one volume over the mesh — including multi-hop halo pulls when a
slab spans several devices' z-shares — reproduces the unsharded result.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.core.spatial_shard import SpatialShardedInferer, _z_starts
from segmentation3d_tpu.parallel import make_mesh


class _BlurNet:
    """Fake net with a genuine spatial receptive field: class-1 prob is a
    3-voxel z-average, so halo-plane errors WOULD corrupt the result."""

    def apply(self, variables, x, train=False):
        v = x[..., :1]
        blur = (jnp.roll(v, 1, axis=1) + v + jnp.roll(v, -1, axis=1)) / 3.0
        return jnp.concatenate([1.0 - blur, blur], axis=-1)


def _vol(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0.2, 0.8, shape + (1,)), jnp.float32)


def test_z_starts_cover():
    st = _z_starts(64, 16, 12)
    assert st[0] == 0 and st[-1] == 64 - 16
    covered = np.zeros(64, bool)
    for s in st:
        covered[s:s + 16] = True
    assert covered.all()


def test_spatial_shard_matches_single_device():
    """8-way z-sharded == 1-device run of the same engine (gaussian blend,
    overlapping slabs, slab deeper than one device's share -> 4 halo hops)."""
    vol = _vol((32, 16, 16))
    kw = dict(slab_z=16, num_classes=2, stride_z=8, blend="gaussian")
    ref = SpatialShardedInferer(_BlurNet(), mesh=make_mesh(1), **kw)
    shd = SpatialShardedInferer(_BlurNet(), mesh=make_mesh(8), **kw)
    m1, p1 = ref(None, vol, return_prob=True)
    m8, p8 = shd(None, vol, return_prob=True)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m8), np.asarray(m1))


def test_spatial_shard_matches_sliding_window():
    """Cross-engine: z-sharded spatial inference == the replicated
    SlidingWindowInferer on identical slab partitioning (constant blend for
    exact weight agreement)."""
    vol = _vol((32, 16, 16), seed=3)
    sw = SlidingWindowInferer(_BlurNet(), (8, 16, 16), 2, batch_size=4,
                              blend="constant")
    sp = SpatialShardedInferer(_BlurNet(), slab_z=8, num_classes=2,
                               stride_z=4, blend="constant", mesh=make_mesh(8))
    _, p_sw = sw(None, vol, stride_zyx=(4, 16, 16), return_prob=True)
    _, p_sp = sp(None, vol, return_prob=True)
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_sw), atol=1e-5)


def test_spatial_shard_pads_odd_depth():
    """Volume depth not divisible by the mesh size is padded and trimmed.

    The reference run pads to the same 32-plane depth explicitly (padding
    changes slab placement, so an unpadded 1-device run is a different —
    equally valid — blend)."""
    vol = _vol((27, 16, 16), seed=5)
    sp = SpatialShardedInferer(_BlurNet(), slab_z=8, num_classes=2,
                               stride_z=8, blend="constant", mesh=make_mesh(8))
    mask, prob = sp(None, vol, return_prob=True)
    assert mask.shape == (27, 16, 16)
    ref = SpatialShardedInferer(_BlurNet(), slab_z=8, num_classes=2,
                                stride_z=8, blend="constant", mesh=make_mesh(1))
    vol_p = jnp.pad(vol, ((0, 5), (0, 0), (0, 0), (0, 0)))
    _, prob_ref = ref(None, vol_p, return_prob=True)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref)[:27],
                               atol=1e-5)


def test_spatial_shard_real_vnet():
    """End-to-end with a real (tiny) V-Net: sharded == unsharded argmax."""
    from segmentation3d_tpu.models.vnet import SegmentationNet

    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    x0 = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    vol = _vol((32, 16, 16), seed=7)
    kw = dict(slab_z=16, num_classes=2, stride_z=8, blend="gaussian")
    ref = SpatialShardedInferer(net, mesh=make_mesh(1), **kw)
    shd = SpatialShardedInferer(net, mesh=make_mesh(8), **kw)
    _, p1 = ref(variables, vol, return_prob=True)
    _, p8 = shd(variables, vol, return_prob=True)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=2e-5)


def test_spatial_shard_via_segmentation(tmp_path):
    """The public segmentation() path with spatial_shard=True produces the
    same mask as the replicated SLAB path (8-device CPU mesh)."""
    from segmentation3d_tpu.core.seg_infer import segmentation
    from segmentation3d_tpu.io import Volume, read_image, write_image
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.ops.geometry import Frame
    from segmentation3d_tpu.utils import model_io
    from segmentation3d_tpu.utils.normalizer import FixedNormalizer

    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False))
    model_dir = str(tmp_path / "model")
    model_io.save_checkpoint(
        model_dir, 0, 0, variables, net_name="vnet", max_stride=16,
        in_channels=1, out_channels=2, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(mean=0.0, stddev=1.0)],
        extra={"net_kwargs": {"base_channels": 2}})

    rng = np.random.default_rng(11)
    img = rng.normal(0.0, 1.0, (48, 32, 32)).astype(np.float32)
    src = str(tmp_path / "case.nii.gz")
    write_image(Volume(img, Frame.identity()), src)

    kw = dict(seg_name="seg.nii.gz", partition_type="SLAB",
              partition_size=[16, 16, 16], partition_stride=[8, 8, 8],
              blend="constant", shape_bucket=16)
    segmentation(src, model_dir, str(tmp_path / "o1"), **kw)
    segmentation(src, model_dir, str(tmp_path / "o2"),
                 num_devices=8, spatial_shard=True, **kw)
    m1 = read_image(str(tmp_path / "o1" / "case" / "seg.nii.gz")).data
    m2 = read_image(str(tmp_path / "o2" / "case" / "seg.nii.gz")).data
    assert (m1 == m2).mean() > 0.999

    # guard rails: spatial_shard needs a real mesh and SLAB partitioning
    with pytest.raises(ValueError, match="num_devices"):
        segmentation(src, model_dir, str(tmp_path / "o3"),
                     spatial_shard=True, **kw)
    with pytest.raises(ValueError, match="SLAB"):
        segmentation(src, model_dir, str(tmp_path / "o4"), seg_name="s.nii.gz",
                     num_devices=8, spatial_shard=True, shape_bucket=16)
