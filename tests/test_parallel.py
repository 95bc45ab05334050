"""Multi-device (8 fake CPU devices, see conftest) sharding tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from segmentation3d_tpu.parallel import make_mesh, shard_batch, replicate, data_sharding
from segmentation3d_tpu.parallel.mesh import pad_batch_to_devices


def test_eight_fake_devices():
    assert jax.device_count() == 8, (
        "conftest must provide 8 virtual CPU devices for sharding tests")


def test_make_mesh_sizes():
    assert make_mesh(-1).devices.size == 8
    assert make_mesh(4).devices.size == 4
    assert make_mesh(100).devices.size == 8
    assert make_mesh(-1).axis_names == ("data",)


def test_shard_and_replicate_placement():
    mesh = make_mesh(8)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding == data_sharding(mesh)
    p = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert p["w"].sharding.is_fully_replicated


def test_pad_batch():
    assert pad_batch_to_devices(5, 8) == 8
    assert pad_batch_to_devices(8, 8) == 8
    assert pad_batch_to_devices(9, 8) == 16


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """The SPMD train step on an 8-device mesh must produce the same params
    as single-device execution (XLA inserts the gradient psum)."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.losses import MultiDiceLoss
    from segmentation3d_tpu.core.seg_train import make_train_step

    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    x0 = jnp.zeros((1, 16, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    # SGD, not Adam: Adam normalizes near-zero grads to ~sign(grad)*lr, which
    # amplifies reduction-order noise into spurious test failures.
    optimizer = optax.sgd(1e-2)
    loss_fn = MultiDiceLoss(num_class=2)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 16, 16, 16, 1)), jnp.float32)
    segs = jnp.asarray(rng.integers(0, 2, size=(8, 16, 16, 16)), jnp.int32)

    def run(mesh_size):
        mesh = make_mesh(mesh_size)
        params = replicate(jax.tree_util.tree_map(jnp.copy, variables["params"]), mesh)
        stats = replicate(jax.tree_util.tree_map(jnp.copy, variables["batch_stats"]), mesh)
        opt_state = replicate(optimizer.init(params), mesh)
        step = make_train_step(net, loss_fn, optimizer)
        im, sg = shard_batch((images, segs), mesh)
        params, stats, opt_state, loss = step(params, stats, opt_state, im, sg)
        return jax.device_get(params), float(loss)

    p1, l1 = run(1)
    p8, l8 = run(8)
    assert abs(l1 - l8) < 1e-5
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class _IdentityNet:
    """Fake net: class-1 probability == input voxel value (exact blend oracle)."""

    def apply(self, variables, x, train=False):
        v = x[..., :1]
        return jnp.concatenate([1.0 - v, v], axis=-1)


def test_inference_engine_whole_volume():
    """Single-device engine: constant-blend non-overlap tiling is exact."""
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer

    vol = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, (16, 16, 16, 1)),
                      jnp.float32)
    inf = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=8,
                               blend="constant")
    _, prob = inf(None, vol, stride_zyx=(8, 8, 8), return_prob=True)
    np.testing.assert_allclose(np.asarray(prob[..., 1]), np.asarray(vol[..., 0]),
                               atol=1e-5)


def test_sharded_inference_engine():
    """mesh= REALLY splits the box-batch axis: each of the 8 devices scans
    NB/8 box batches (observed at trace time inside shard_map), and the
    blended result matches the single-device engine."""
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer

    vol = jnp.asarray(np.random.default_rng(1).uniform(0.2, 0.8, (16, 16, 16, 1)),
                      jnp.float32)
    # stride 4 -> 27 overlapping boxes; batch 2 -> 14 box batches -> padded
    # to 16 over the 8-device mesh -> per-device share must be 2
    single = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=2,
                                  blend="gaussian")
    sharded = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=2,
                                   blend="gaussian", mesh=make_mesh(8))
    assert sharded.mesh is not None

    traced_box_shapes = []
    orig = sharded._accumulate

    def spy(variables, v, boxes, mask):
        traced_box_shapes.append(tuple(boxes.shape))
        return orig(variables, v, boxes, mask)

    sharded._accumulate = spy

    s1, p1 = single(None, vol, stride_zyx=(4, 4, 4), return_prob=True)
    s8, p8 = sharded(None, vol, stride_zyx=(4, 4, 4), return_prob=True)

    assert traced_box_shapes == [(2, 2, 3)], (
        f"per-device box-batch shard should be [NB/8=2, B=2, 3], traced "
        f"{traced_box_shapes}")
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s1))
