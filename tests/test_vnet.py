import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation3d_tpu.models import create_network, get_network_module, max_stride_of
from segmentation3d_tpu.models.vnet import SegmentationNet, vnet_focal_init


def _init(net, shape):
    x = jnp.zeros(shape, jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


def test_conv_backend_window_same_params_and_output():
    """conv_backend='window' keeps the param tree (checkpoint contract) and
    computes the same function as the direct lowering."""
    import jax.tree_util as jtu
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)), jnp.float32)
    net_d = SegmentationNet(1, 2)
    net_w = SegmentationNet(1, 2, conv_backend="window")
    v = net_d.init(jax.random.PRNGKey(0), x, train=False)
    v2 = net_w.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v) == jtu.tree_structure(v2)
    od = net_d.apply(v, x, train=False)
    ow = net_w.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(od), np.asarray(ow), atol=2e-2)


def test_registry():
    mod = get_network_module("vnet")
    assert mod.max_stride() == 16
    assert max_stride_of("vnet") == 16
    net = create_network("vnet", 1, 2)
    assert isinstance(net, SegmentationNet)
    with pytest.raises(ModuleNotFoundError):
        get_network_module("no_such_net")


def test_forward_shapes_and_softmax():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    variables, x = _init(net, (1, 32, 32, 32, 1))
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_multimodality_multiclass():
    net = SegmentationNet(in_channels=4, out_channels=4, base_channels=4)
    variables, x = _init(net, (2, 16, 16, 16, 4))
    out = net.apply(variables, x, train=False)
    assert out.shape == (2, 16, 16, 16, 4)


def test_encoder_channel_arithmetic():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=16)
    variables, _ = _init(net, (1, 16, 16, 16, 1))
    p = variables["params"]
    assert p["in_block"]["conv"]["conv"]["kernel"].shape[-1] == 16
    for c in (32, 64, 128, 256):
        assert p[f"down_{c}"]["down_conv"]["kernel"].shape[-1] == c
    # up blocks: deconv halves, concat restores
    for c in (256, 128, 64, 32):
        assert p[f"up_{c}"]["up_conv"]["kernel"].shape[-1] == c // 2
        assert p[f"up_{c}"]["res"]["conv0"]["conv"]["kernel"].shape[-2] == c


def test_batchnorm_stats_update():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    variables, _ = _init(net, (1, 16, 16, 16, 1))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1)) * 3 + 5
    out, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["in_block"]["conv"]["bn"]["mean"]
    after = mutated["batch_stats"]["in_block"]["conv"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_focal_init_sets_prior():
    net = SegmentationNet(in_channels=1, out_channels=3, base_channels=4)
    variables, x = _init(net, (1, 16, 16, 16, 1))
    variables = vnet_focal_init(variables, obj_p=0.01)
    b = np.asarray(variables["params"]["out_block"]["proj"]["bias"])
    assert b[0] == 0.0
    np.testing.assert_allclose(b[1:], -np.log(0.99 / 0.01), rtol=1e-4)


def test_bottleneck_variant_runs():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=8, bottleneck=True)
    variables, x = _init(net, (1, 16, 16, 16, 1))
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)


def test_prelu_variant_runs():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4, act="prelu")
    variables, x = _init(net, (1, 16, 16, 16, 1))
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)


def test_logits_output():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    variables, x = _init(net, (1, 16, 16, 16, 1))
    logits = net.apply(variables, x, train=False, return_logits=True)
    probs = net.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(logits, -1)),
                               np.asarray(probs), atol=1e-6)


@pytest.mark.slow
def test_grad_flows():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    variables, x = _init(net, (1, 16, 16, 16, 1))
    from segmentation3d_tpu.losses import multi_dice_loss
    target = jnp.zeros((1, 16, 16, 16), jnp.int32)

    def loss_fn(params):
        out, _ = net.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        l, _ = multi_dice_loss(out, target)
        return l

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_vbnet_registry():
    """'vbnet' resolves to the bottleneck-block variant (the reference's
    BottConvBnRelu3/BottResidualBlock3 blocks, vnet.py ~L35-125), with the
    same registry surface as 'vnet'."""
    mod = get_network_module("vbnet")
    assert mod.max_stride() == 16
    net = mod.SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    assert isinstance(net, SegmentationNet) and net.bottleneck
    variables, x = _init(net, (1, 16, 16, 16, 1))
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # explicit override still wins (it is a default, not a lock)
    assert not mod.SegmentationNet(in_channels=1, out_channels=2,
                                   bottleneck=False).bottleneck
