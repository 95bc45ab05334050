"""Channel-packed XLA conv parity vs the direct conv."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.ops import packed_conv as pk
from segmentation3d_tpu.ops.pallas_conv import thin_conv3d_reference

rng = np.random.default_rng(0)


def _check(B, D, H, W, cin, cout, P=None):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = thin_conv3d_reference(x, w, b, "none")
    out = pk.packed_conv3d(x, w, b, P=P, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)


@pytest.mark.parametrize("cin,cout", [(16, 16), (1, 16), (32, 32), (32, 2)])
def test_parity_shapes(cin, cout):
    _check(1, 6, 8, 16, cin, cout)


def test_parity_unaligned_width():
    _check(1, 4, 8, 20, 16, 16)   # W=20 not a multiple of P=8
    _check(2, 4, 8, 8, 16, 16, P=4)


def test_parity_p1_fallback():
    _check(1, 4, 8, 8, 128, 128)  # P=1: plain conv path


def test_pick_p():
    assert pk.pick_p(16, 16) == 8
    assert pk.pick_p(1, 16) == 8
    assert pk.pick_p(32, 32) == 4
    assert pk.pick_p(32, 2) == 4
    assert pk.pick_p(128, 128) == 1


def test_packed_conv_grad():
    """Pure-XLA => differentiable (usable in the training path)."""
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) * 0.1, jnp.float32)

    def f_packed(w):
        return jnp.sum(pk.packed_conv3d(x, w, out_dtype=jnp.float32) ** 2)

    def f_ref(w):
        return jnp.sum(thin_conv3d_reference(x, w, None, "none") ** 2)

    g1 = jax.grad(f_packed)(w)
    g2 = jax.grad(f_ref)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0.08,
                               atol=0.08 * float(jnp.max(jnp.abs(g2))))


def _check_window(B, D, H, W, cin, cout, P=None):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = thin_conv3d_reference(x, w, b, "none")
    out = pk.window_conv3d(x, w, b, P=P, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)


@pytest.mark.parametrize("cin,cout", [(16, 16), (1, 16), (32, 32), (64, 64)])
def test_window_parity_shapes(cin, cout):
    _check_window(1, 6, 8, 16, cin, cout, P=4)


def test_window_parity_default_p():
    _check_window(1, 5, 7, 16, 16, 16)          # P=8
    _check_window(2, 4, 6, 8, 8, 32)            # P=4


def test_window_parity_unaligned_width():
    _check_window(1, 4, 8, 20, 16, 16, P=8)     # W=20 -> cols=3, pad 4
    _check_window(1, 4, 8, 9, 16, 16, P=4)


def test_window_parity_head_like():
    _check_window(1, 4, 8, 64, 32, 2, P=16)     # thin-cout head shape


def test_pick_window_p():
    assert pk.pick_window_p(64) == 2
    assert pk.pick_window_p(32) == 4
    assert pk.pick_window_p(16) == 8
    assert pk.pick_window_p(2) == 32   # capped (see pick_window_p docstring)
    assert pk.pick_window_p(128) == 1


def test_window_conv_grad():
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) * 0.1, jnp.float32)

    def f_win(w):
        return jnp.sum(pk.window_conv3d(x, w, P=4, out_dtype=jnp.float32) ** 2)

    def f_ref(w):
        return jnp.sum(thin_conv3d_reference(x, w, None, "none") ** 2)

    g1 = jax.grad(f_win)(w)
    g2 = jax.grad(f_ref)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0.08,
                               atol=0.08 * float(jnp.max(jnp.abs(g2))))


def test_deconv2x_matches_conv_transpose():
    """Pixel-shuffle GEMM == jax.lax.conv_transpose (k=2, s=2, VALID)."""
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 5, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 16, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    ref = jax.lax.conv_transpose(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32) + b.reshape(1, 1, 1, 1, -1)
    out = pk.deconv2x(x, w, b, out_dtype=jnp.float32)
    assert out.shape == ref.shape == (2, 6, 8, 10, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fn_name", ["window", "packed"])
def test_bf16_grad(fn_name):
    """bf16 activations must be differentiable (the training conv backend):
    regression for the preferred_element_type/cotangent dtype mismatch."""
    from segmentation3d_tpu.ops.packed_conv import window_conv3d, packed_conv3d
    fn = window_conv3d if fn_name == "window" else packed_conv3d
    rng_l = np.random.default_rng(5)
    x = jnp.asarray(rng_l.normal(size=(1, 4, 8, 8, 16)), jnp.bfloat16)
    w = jnp.asarray(rng_l.normal(size=(3, 3, 3, 16, 16)), jnp.float32)
    b = jnp.asarray(rng_l.normal(size=(16,)), jnp.float32)

    def loss(w):
        return fn(x, w, b, out_dtype=jnp.bfloat16).astype(jnp.float32).sum()

    g = jax.grad(loss)(w)
    assert g.dtype == jnp.float32 and bool(jnp.all(jnp.isfinite(g)))
    # grads of the two lowerings agree (same math)
    from segmentation3d_tpu.ops.packed_conv import (
        window_conv3d as wc, packed_conv3d as pc)
    g2 = jax.grad(lambda w: pc(x, w, b, out_dtype=jnp.bfloat16)
                  .astype(jnp.float32).sum())(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=0.1, atol=0.5)
