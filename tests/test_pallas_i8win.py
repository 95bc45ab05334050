"""Parity tests for the int8 in-kernel-halo Pallas window conv
(`ops/pallas_i8win.py`) against the XLA 3-conv reference, interpret mode
(the real-TPU A/B lives in benchmarks/bench_i8win.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.ops.packed_conv import window_kernels_np
from segmentation3d_tpu.ops.quant import quantize_weight_np
from segmentation3d_tpu.ops.pallas_i8win import (
    window_conv_i8_pallas, reference_i8, mid9_np, halo9_np)


def _setup(P, cin, D, H, cols, seed=0):
    rng = np.random.default_rng(seed)
    pc = P * cin
    w = rng.normal(0, 0.3, (3, 3, 3, cin, cin)).astype(np.float32)
    wq, ws = quantize_weight_np(w)
    mid, wl, wr = window_kernels_np(wq.astype(np.float32), P)
    x = rng.integers(-127, 128, (1, D, H, cols, pc)).astype(np.int8)
    scale = np.tile(ws * (8.0 / 127.0), P).astype(np.float32)
    bias = rng.normal(0, 0.5, pc).astype(np.float32)
    alpha = np.full(pc, 0.25, np.float32)
    return (jnp.asarray(x), mid.astype(np.int8), wl.astype(np.int8),
            wr.astype(np.int8), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(alpha))


@pytest.mark.parametrize("act,out_int8", [("relu", True), ("prelu", True),
                                          ("none", False)])
def test_parity_vs_xla_reference(act, out_int8):
    P, cin = 4, 4
    x, mid, wl, wr, scale, bias, alpha = _setup(P, cin, 3, 8, 6)
    ref = np.asarray(reference_i8(
        x, jnp.asarray(mid), jnp.asarray(wl), jnp.asarray(wr), scale, bias,
        alpha, P=P, cin=cin, act=act, inv_sa=127.0 / 8.0, out_int8=out_int8))
    got = np.asarray(window_conv_i8_pallas(
        x, jnp.asarray(mid9_np(mid)), jnp.asarray(halo9_np(wl)),
        jnp.asarray(halo9_np(wr)), scale, bias, alpha, P=P, cin=cin,
        cout=cin, act=act, inv_sa=127.0 / 8.0, out_int8=out_int8,
        interpret=True))
    if out_int8:
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got.astype(np.float32),
                                   ref.astype(np.float32), atol=0.05)


def test_parity_y_tiled():
    """ht < H exercises the overlapping row-gather tiling path."""
    P, cin = 2, 8
    x, mid, wl, wr, scale, bias, alpha = _setup(P, cin, 2, 12, 4, seed=3)
    ref = np.asarray(reference_i8(
        x, jnp.asarray(mid), jnp.asarray(wl), jnp.asarray(wr), scale, bias,
        alpha, P=P, cin=cin, act="relu", inv_sa=127.0 / 8.0))
    got = np.asarray(window_conv_i8_pallas(
        x, jnp.asarray(mid9_np(mid)), jnp.asarray(halo9_np(wl)),
        jnp.asarray(halo9_np(wr)), scale, bias, alpha, P=P, cin=cin,
        cout=cin, act="relu", inv_sa=127.0 / 8.0, interpret=True, ht=4))
    np.testing.assert_array_equal(got, ref)


def test_parity_full_k_halo_mode():
    """halo9_full_np (unsliced full-K halo GEMMs) is bit-identical to the
    lane-sliced narrow mode."""
    from segmentation3d_tpu.ops.pallas_i8win import halo9_full_np
    P, cin = 4, 4
    x, mid, wl, wr, scale, bias, alpha = _setup(P, cin, 3, 8, 6, seed=7)
    kw = dict(P=P, cin=cin, cout=cin, act="relu", inv_sa=127.0 / 8.0,
              interpret=True)
    a = np.asarray(window_conv_i8_pallas(
        x, jnp.asarray(mid9_np(mid)), jnp.asarray(halo9_np(wl)),
        jnp.asarray(halo9_np(wr)), scale, bias, alpha, **kw))
    b = np.asarray(window_conv_i8_pallas(
        x, jnp.asarray(mid9_np(mid)),
        jnp.asarray(halo9_full_np(wl, P, "left")),
        jnp.asarray(halo9_full_np(wr, P, "right")), scale, bias, alpha, **kw))
    np.testing.assert_array_equal(a, b)
