"""Analytic FLOP accounting (utils/flops.py) vs XLA's own cost model."""
import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.utils.flops import (
    vnet_forward_flops, sliding_window_flops)


def _xla_flops(net, shape):
    x = jnp.zeros((1,) + shape + (net.in_channels,), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    f = jax.jit(lambda vv, xx: net.apply(vv, xx, train=False))
    c = f.lower(v, x).compile().cost_analysis()
    if not isinstance(c, dict):  # older jax returns a list
        c = c[0]
    return float(c["flops"])


def test_matches_xla_cost_model():
    """Sanity band against XLA's cost model (a dropped/doubled level would
    be a 1.3-2x error). The band is wide because the cost model is
    platform-dependent: the same graph reports 7.08 GF on the TPU plugin
    and 5.58 GF on CPU (measured), with the analytic conv-only count
    (6.64 GF) between them."""
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=16)
    mine = vnet_forward_flops((32, 32, 32), 1, 2)
    xla = _xla_flops(net, (32, 32, 32))
    assert 0.70 * xla <= mine <= 1.40 * xla, (mine, xla)


def test_matches_xla_multichannel_arch():
    net = SegmentationNet(in_channels=4, out_channels=4, base_channels=8,
                          down_convs=(1, 2), up_convs=(2, 1))
    mine = vnet_forward_flops((16, 16, 16), 4, 4, base_channels=8,
                              down_convs=(1, 2), up_convs=(2, 1))
    xla = _xla_flops(net, (16, 16, 16))
    assert 0.70 * xla <= mine <= 1.40 * xla, (mine, xla)


def test_sliding_window_scales_with_boxes():
    one = vnet_forward_flops((32, 32, 32), 1, 2)
    total = sliding_window_flops((64, 64, 64), (32, 32, 32), (32, 32, 32),
                                 1, 2)
    assert np.isclose(total, 8 * one)
    overl = sliding_window_flops((64, 64, 64), (32, 32, 32), (16, 16, 16),
                                 1, 2)
    assert overl > total  # overlap -> more boxes -> more executed flops
