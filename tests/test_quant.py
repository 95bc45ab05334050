"""int8 quantized inference path (ops/quant.py +
models/packed_vnet.py:build_packed_forward(quant='int8'))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.models.packed_vnet import build_packed_forward
from segmentation3d_tpu.ops.quant import (
    quantize_weight_np, conv_i8, window_conv_packed_i8, down_conv_packed_i8,
    deconv_gemm_apply_i8, concat_packed_i8)

rng = np.random.default_rng(7)


def test_quantize_weight_roundtrip():
    w = rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32) * 0.3
    w[..., 3] = 0.0  # an all-zero output channel must not divide by zero
    wq, s = quantize_weight_np(w)
    assert wq.dtype == np.int8 and s.shape == (16,)
    assert np.abs(wq).max() <= 127
    assert s[3] == 1.0 and np.all(wq[..., 3] == 0)
    # per-channel reconstruction error bounded by half a quantization step
    err = np.abs(wq.astype(np.float32) * s - w)
    assert np.all(err <= 0.5 * s + 1e-7)


def test_conv_i8_exact():
    """int8 x int8 -> int32 conv is EXACT integer arithmetic."""
    x = rng.integers(-127, 128, size=(1, 4, 5, 6, 8)).astype(np.int8)
    w = rng.integers(-127, 128, size=(3, 3, 3, 8, 4)).astype(np.int8)
    y = conv_i8(jnp.asarray(x), jnp.asarray(w), (1, 1, 1),
                ((1, 1), (1, 1), (1, 1)))
    yf = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32), (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    assert y.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yf, np.int64))


def test_window_conv_packed_i8_exact():
    """The int8 narrow-halo window decomposition == the plain int conv."""
    from segmentation3d_tpu.ops.packed_conv import window_kernels_np
    cin, cout, P, W = 4, 8, 4, 16
    x = rng.integers(-50, 51, size=(1, 4, 4, W, cin)).astype(np.int8)
    w = rng.integers(-50, 51, size=(3, 3, 3, cin, cout)).astype(np.int8)
    mid, wl, wr = window_kernels_np(w, P)
    xp = jnp.asarray(x).reshape(1, 4, 4, W // P, P * cin)
    out = window_conv_packed_i8(xp, jnp.asarray(mid), jnp.asarray(wl),
                                jnp.asarray(wr), P=P, cin=cin)
    out = np.asarray(out).reshape(1, 4, 4, W, cout)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32), (1, 1, 1),
        "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_array_equal(out, np.asarray(ref, np.int64))


def test_window_conv_packed_i8_deq_scale():
    """deq_scale: the three convs dequantize inside their own fusions and
    the pad-adds run bf16 — distributively equal to dequantizing the s32
    sum, up to per-term bf16 rounding (well under an int8 step)."""
    from segmentation3d_tpu.ops.packed_conv import window_kernels_np
    cin, cout, P, W = 4, 8, 4, 16
    x = rng.integers(-50, 51, size=(1, 4, 4, W, cin)).astype(np.int8)
    w = rng.integers(-50, 51, size=(3, 3, 3, cin, cout)).astype(np.int8)
    s = np.tile(rng.uniform(0.5, 2.0, size=cout).astype(np.float32), P)
    mid, wl, wr = window_kernels_np(w, P)
    xp = jnp.asarray(x).reshape(1, 4, 4, W // P, P * cin)
    raw = window_conv_packed_i8(xp, jnp.asarray(mid), jnp.asarray(wl),
                                jnp.asarray(wr), P=P, cin=cin)
    deq = window_conv_packed_i8(xp, jnp.asarray(mid), jnp.asarray(wl),
                                jnp.asarray(wr), P=P, cin=cin,
                                deq_scale=jnp.asarray(s))
    assert deq.dtype == jnp.bfloat16
    ref = np.asarray(raw, np.float32) * s.reshape(1, 1, 1, 1, -1)
    np.testing.assert_allclose(np.asarray(deq, np.float32), ref,
                               rtol=2e-2, atol=1e-2 * np.abs(ref).max())


def test_down_and_deconv_i8_exact():
    from segmentation3d_tpu.ops.packed_conv import (
        down_kernel_np, deconv_gemm_np, deconv_unshuffle)
    cin, cout, P, W = 4, 8, 4, 16
    x = rng.integers(-50, 51, size=(1, 4, 4, W, cin)).astype(np.int8)
    xp = jnp.asarray(x).reshape(1, 4, 4, W // P, P * cin)
    # down conv k=2/s=2
    wd = rng.integers(-50, 51, size=(2, 2, 2, cin, cout)).astype(np.int8)
    yd = down_conv_packed_i8(xp, jnp.asarray(down_kernel_np(wd, P)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(wd, jnp.float32), (2, 2, 2),
        ((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = np.asarray(yd).reshape(1, 2, 2, W // 2, cout)
    np.testing.assert_array_equal(got, np.asarray(ref, np.int64))
    # deconv k=2/s=2 (GEMM + unshuffle)
    wu = rng.integers(-50, 51, size=(2, 2, 2, cin, cout)).astype(np.int8)
    k = deconv_gemm_np(wu, P)
    yu = deconv_gemm_apply_i8(xp, jnp.asarray(k))  # rank-5 GEMM output
    yu = yu.reshape(1, 4, 4, W // P, 2, 2, 2 * P * cout)
    yu = deconv_unshuffle(yu)  # int32 [1, 8, 8, W//P, 2P*cout]
    got = np.asarray(yu).reshape(1, 8, 8, 2 * W, cout)
    ref = jax.lax.conv_transpose(
        jnp.asarray(x, jnp.float32), jnp.asarray(wu, jnp.float32), (2, 2, 2),
        "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_array_equal(got, np.asarray(ref, np.int64))


def test_concat_packed_i8_exact():
    from segmentation3d_tpu.ops.packed_conv import (
        interleave_perm_np, concat_packed)
    P, ca, cb = 4, 2, 3
    a = rng.integers(-127, 128, size=(1, 2, 2, 5, P * ca)).astype(np.int8)
    b = rng.integers(-127, 128, size=(1, 2, 2, 5, P * cb)).astype(np.int8)
    perm = interleave_perm_np(P, ca, cb)
    got = concat_packed_i8(jnp.asarray(a), jnp.asarray(b), ca, cb,
                           perm=jnp.asarray(perm.astype(np.int8)))
    assert got.dtype == jnp.int8
    ref = concat_packed(jnp.asarray(a, jnp.float32),
                        jnp.asarray(b, jnp.float32), ca, cb,
                        perm=jnp.asarray(perm))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref, np.int64))


@pytest.mark.parametrize("act", ["relu", "prelu"])
def test_quant_forward_parity(act):
    """Random-init net (a WORSE case than a trained one: no real BN
    standardization behind the fold): softmax probabilities within 0.06,
    argmax agreement >= 98%."""
    net = SegmentationNet(in_channels=1, out_channels=2, act=act)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    qf, qv = build_packed_forward(net, variables, dtype=jnp.float32,
                                  quant="int8")
    out = np.asarray(qf(qv, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.06
    agree = np.mean(np.argmax(out, -1) == np.argmax(ref, -1))
    assert agree >= 0.98


def test_quant_forward_multiclass_multimodal():
    net = SegmentationNet(in_channels=4, out_channels=4)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 4)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    qf, qv = build_packed_forward(net, variables, dtype=jnp.float32,
                                  quant="int8")
    out = np.asarray(qf(qv, x))
    assert np.mean(np.argmax(out, -1) == np.argmax(ref, -1)) >= 0.98


def test_quant_kernels_are_int8():
    """Every conv kernel in a quant build ships as int8 (the point: int8
    MXU GEMMs + halved weight bytes); scales/biases are f32 lane vectors."""
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    _, qv = build_packed_forward(net, variables, dtype=jnp.float32,
                                 quant="int8")
    for key, site in qv.items():
        if key == "in_block/conv":  # stem stays bf16-weighted
            assert site["mid"].dtype == np.float32
            continue
        if key == "out_block/proj":  # f32 softmax head projection
            continue
        for name in ("mid", "left", "right", "k", "w"):
            if name in site:
                assert site[name].dtype == np.int8, (key, name)
        if "s" in site:
            assert site["s"].dtype == np.float32


def test_quant_rejects_unknown_mode():
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="quant"):
        build_packed_forward(net, variables, quant="int4")


def test_calibrated_quant():
    """calibrate_int8 -> per-site scales. The bookkeeping is pinned by an
    EXACTNESS property: a constant-8.0 calib dict at margin 1.0 must
    reproduce the uncalibrated act_clip=8 build bit-for-bit (same scales
    threaded through every dequant/requant/unification site). Measured
    maxima keep argmax agreement and avoid the global build's saturation
    (random-init activations genuinely exceed 8 sigma at several res-add
    sites — calibration is what makes those faithful)."""
    from segmentation3d_tpu.models.packed_vnet import calibrate_int8
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(2), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))

    amax = calibrate_int8(net, variables, [x], dtype=jnp.float32)
    assert all(v > 0 for v in amax.values())

    const = {k: 8.0 for k in amax}
    qf_g, qv_g = build_packed_forward(net, variables, dtype=jnp.float32,
                                      quant="int8")
    qf_c, qv_c = build_packed_forward(net, variables, dtype=jnp.float32,
                                      quant="int8", calib=const,
                                      calib_margin=1.0)
    np.testing.assert_array_equal(np.asarray(qf_g(qv_g, x)),
                                  np.asarray(qf_c(qv_c, x)))

    qf, qv = build_packed_forward(net, variables, dtype=jnp.float32,
                                  quant="int8", calib=amax)
    out_c = np.asarray(qf(qv, x))
    assert np.abs(out_c - ref).max() < 0.1
    assert np.mean(np.argmax(out_c, -1) == np.argmax(ref, -1)) >= 0.98

    # an incomplete calib dict is an error, not a silent fallback
    bad = dict(amax)
    bad.pop("in_block/conv")
    with pytest.raises(ValueError, match="missing activation site"):
        build_packed_forward(net, variables, dtype=jnp.float32,
                             quant="int8", calib=bad)


def test_stats_mode_rejects_quant():
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="stats"):
        build_packed_forward(net, variables, quant="int8", stats=True)


def test_concat_fold_int8_bit_exact():
    """int8 + concat_fold is BIT-exact vs the perm-GEMM int8 build: the
    fold only reorders int32 accumulations and drops the (value-preserving)
    perm conv + its requant pass."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.packed_vnet import build_packed_forward
    net = SegmentationNet(in_channels=1, out_channels=2, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(3), x, train=False)
    ref_fn, ref_fv = build_packed_forward(net, variables, quant="int8",
                                          concat_fold=False)
    fold_fn, fold_fv = build_packed_forward(net, variables, quant="int8",
                                            concat_fold=True)
    a = np.asarray(ref_fn(ref_fv, x))
    b = np.asarray(fold_fn(fold_fv, x))
    np.testing.assert_array_equal(np.argmax(a, -1), np.argmax(b, -1))
    np.testing.assert_allclose(b, a, atol=1e-6)
