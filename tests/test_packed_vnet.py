"""Packed-domain V-Net forward (models/packed_vnet.py) — exact-function
parity against the reference flax forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.models.packed_vnet import build_packed_forward

rng = np.random.default_rng(0)


def _parity(in_ch, out_ch, shape, act="relu", base=16, atol=0.02):
    net = SegmentationNet(in_channels=in_ch, out_channels=out_ch,
                          base_channels=base, act=act)
    x = jnp.asarray(rng.normal(size=(1,) + shape + (in_ch,)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.float32)
    out = np.asarray(apply_fn(fv, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol)
    agree = np.mean(np.argmax(out, -1) == np.argmax(ref, -1))
    assert agree > 0.99


def test_parity_2class():
    _parity(1, 2, (16, 16, 32))


def test_parity_multiclass_multimodal():
    _parity(4, 4, (16, 32, 32))


def test_parity_3class():
    _parity(1, 3, (16, 16, 64))


def test_parity_adaptive_head_w48():
    """W=48 (max_stride-legal, not %32) via head_p=head_p_for(48, nc)=16 —
    the builder-selected path in seg_infer for such patch widths."""
    from segmentation3d_tpu.ops.packed_conv import head_p_for
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 48, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    ph = head_p_for(48, 2)
    assert ph == 16
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.float32,
                                        head_p=ph)
    out = np.asarray(apply_fn(fv, x))
    np.testing.assert_allclose(out, ref, atol=0.02)
    # packed-head output keeps the adaptive Ph
    pk = apply_fn(fv, x, return_packed=True)
    assert pk.shape == (1, 16, 16, 48 // ph, ph * 2)
    assert apply_fn.packed_head_p == ph
    # mismatched width against a built head errors clearly (40 % 16 != 0)
    xbad = jnp.zeros((1, 16, 16, 40, 1), jnp.float32)
    with pytest.raises(AssertionError, match="head packing"):
        apply_fn(fv, xbad)


def test_parity_prelu():
    _parity(1, 2, (16, 16, 32), act="prelu")


def test_parity_bf16_close():
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.bfloat16)
    out = np.asarray(apply_fn(fv, x))
    agree = np.mean(np.argmax(out, -1) == np.argmax(ref, -1))
    assert agree > 0.98


def test_w_constraint():
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.zeros((1, 16, 16, 48, 1), jnp.float32)  # 48 % 32 != 0
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.float32)
    with pytest.raises(AssertionError):
        apply_fn(fv, x)


def test_packed_blend_tail_equivalence():
    """Slab inference with the packed blend tail (accumulators/argmax in
    [.., cols, Ph*NC] form) must match the generic unpacked tail."""
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x0 = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(2), x0, train=False)
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.float32)
    vol = jnp.asarray(rng.normal(size=(48, 32, 32, 1)), jnp.float32)
    patch, stride = (16, 32, 32), (12, 32, 32)

    packed = SlidingWindowInferer(net, patch, 2, batch_size=1,
                                  blend="gaussian", apply_fn=apply_fn,
                                  apply_vars=fv, packed_tail=True)
    assert packed._packed_p((48, 32, 32, 1)) is not None
    seg_p, prob_p = packed(variables, vol, stride_zyx=stride,
                           return_prob=True)

    # generic tail: same forward, packed output disabled via a wrapper
    def unpacked_apply(v, x, train=False):
        return apply_fn(v, x, train=train)
    generic = SlidingWindowInferer(net, patch, 2, batch_size=1,
                                   blend="gaussian", apply_fn=unpacked_apply,
                                   apply_vars=fv)
    assert generic._packed_p((48, 32, 32, 1)) is None
    seg_g, prob_g = generic(variables, vol, stride_zyx=stride,
                            return_prob=True)
    np.testing.assert_array_equal(np.asarray(seg_p), np.asarray(seg_g))
    np.testing.assert_allclose(np.asarray(prob_p), np.asarray(prob_g),
                               atol=1e-6)


def test_parity_bf16_accum():
    """accum='bf16' (convs emit bf16 directly — the flax forward's own
    output precision) keeps argmax agreement with the flax reference and
    stays close to the f32-accum packed forward."""
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn, fv = build_packed_forward(net, variables, dtype=jnp.bfloat16,
                                        accum="bf16")
    out = np.asarray(apply_fn(fv, x))
    agree = np.mean(np.argmax(out, -1) == np.argmax(ref, -1))
    assert agree > 0.98
    f32_fn, f32_fv = build_packed_forward(net, variables, dtype=jnp.bfloat16,
                                          accum="f32")
    out_f32 = np.asarray(f32_fn(f32_fv, x))
    np.testing.assert_allclose(out, out_f32, atol=0.05)


def test_accum_validation():
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError):
        build_packed_forward(net, variables, dtype=jnp.float32, accum="bf16")
    with pytest.raises(ValueError):
        build_packed_forward(net, variables, accum="int8")


def test_bottleneck_rejected_loudly():
    """Bottleneck ('vbnet') nets are not packed-lowerable; the builders must
    raise instead of silently mis-lowering (seg_infer catches this and falls
    back to the flax forward)."""
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4,
                          bottleneck=True)
    x = jnp.zeros((1, 16, 16, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(NotImplementedError):
        build_packed_forward(net, variables, dtype=jnp.float32)
    from segmentation3d_tpu.models.packed_train import build_packed_train_apply
    with pytest.raises(NotImplementedError):
        build_packed_train_apply(net)
    from segmentation3d_tpu.models.fused_vnet import build_fused_forward
    with pytest.raises(NotImplementedError):
        build_fused_forward(net, variables, dtype=jnp.float32)


def test_concat_fold_parity_f32():
    """concat_fold=True (round-5 lane-relabeling of the last decoder
    level's skip concat into its consumer kernels) computes the same
    function as the perm-GEMM form."""
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    ref_fn, ref_fv = build_packed_forward(net, variables, dtype=jnp.float32,
                                          concat_fold=False)
    fold_fn, fold_fv = build_packed_forward(net, variables,
                                            dtype=jnp.float32,
                                            concat_fold=True)
    a = np.asarray(ref_fn(ref_fv, x))
    b = np.asarray(fold_fn(fold_fv, x))
    np.testing.assert_allclose(b, a, atol=2e-5)
    flax = np.asarray(net.apply(variables, x, train=False))
    np.testing.assert_allclose(b, flax, atol=0.02)
    # the folded build really dropped the up_32 perm GEMM
    assert "perm" not in fold_fv["up_32/up"]
    assert "perm" in ref_fv["up_32/up"]


def test_concat_fold_parity_adaptive_head():
    """The fold's lane relabeling extends through the head repack for a
    non-default head packing (Ph=16 at W=48)."""
    from segmentation3d_tpu.ops.packed_conv import head_p_for
    net = SegmentationNet(in_channels=1, out_channels=2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 48, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(2), x, train=False)
    ph = head_p_for(48, 2)
    ref_fn, ref_fv = build_packed_forward(net, variables, dtype=jnp.float32,
                                          head_p=ph, concat_fold=False)
    fold_fn, fold_fv = build_packed_forward(net, variables,
                                            dtype=jnp.float32, head_p=ph,
                                            concat_fold=True)
    np.testing.assert_allclose(np.asarray(fold_fn(fold_fv, x)),
                               np.asarray(ref_fn(ref_fv, x)), atol=2e-5)
