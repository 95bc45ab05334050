"""Pallas thin-conv parity vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.ops import pallas_conv as pc

rng = np.random.default_rng(0)


def _check(B, D, H, W, cin, cout, act="relu"):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = pc.thin_conv3d_reference(x, w, b, act)
    out = pc.thin_conv3d(x, w, b, act=act, out_dtype=jnp.float32,
                         interpret=True)
    # bf16 inputs: relative tolerance ~1%
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)


@pytest.mark.parametrize("cin,cout", [(32, 32), (16, 16), (32, 2), (1, 16)])
def test_parity_shapes(cin, cout):
    _check(1, 8, 8, 16, cin, cout)


def test_parity_nonsquare_and_padded_width():
    _check(2, 6, 8, 16, 16, 16)
    _check(1, 4, 8, 24, 32, 32)  # W=24 -> Wb not mult of 4 -> internal pad


def test_parity_prelu_and_none():
    _check(1, 8, 8, 16, 32, 32, act="prelu")
    _check(1, 8, 8, 16, 32, 32, act="none")


def test_fold_bn():
    cin, cout = 4, 8
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32)
    conv = pc.thin_conv3d_reference(x, w, b, "none")
    bn = (conv - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    w2, b2 = pc.fold_bn(w, b, scale, bias, mean, var)
    fused = pc.thin_conv3d_reference(x, w2, b2, "none")
    np.testing.assert_allclose(np.asarray(bn), np.asarray(fused), atol=1e-4)


def test_pack_weights_structure():
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)), jnp.float32)
    L = 8
    wc, wl, wr = (np.asarray(m) for m in pc.pack_weights(w, L))
    assert wc.shape == (9 * L * 2, L * 4)
    assert wl.shape == (9 * 2, L * 4) and wr.shape == (9 * 2, L * 4)
    # center band: (xv, xo) entry zero unless |xv - xo| <= 1
    wc5 = wc.reshape(9, L, 2, L, 4)
    for xv in range(L):
        for xo in range(L):
            blk = wc5[:, xv, :, xo, :]
            if abs(xv - xo) <= 1:
                assert np.any(blk != 0)
            else:
                assert np.all(blk == 0)
    # boundary matrices feed only the edge outputs
    wl4 = wl.reshape(9, 2, L, 4)
    wr4 = wr.reshape(9, 2, L, 4)
    assert np.all(wl4[:, :, 1:, :] == 0) and np.any(wl4[:, :, 0, :] != 0)
    assert np.all(wr4[:, :, :L - 1, :] == 0) and np.any(wr4[:, :, L - 1, :] != 0)


def test_fused_forward_matches_net():
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.fused_vnet import build_fused_forward
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = net.apply(variables, x, train=False)
    fused, fv = build_fused_forward(net, variables, dtype=jnp.float32,
                                    use_pallas=True, interpret=True)
    out = fused(fv, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)
    # argmax agreement (what inference actually uses)
    agree = np.mean(np.argmax(np.asarray(out), -1) == np.argmax(np.asarray(ref), -1))
    assert agree > 0.99


def test_fused_forward_bf16_accum():
    """The fused forward under dtype=bf16 defaults to accum='bf16' (convs
    emit bf16 — the flax forward's own output precision): argmax agreement
    with the f32 reference and closeness to the accum='f32' build."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.fused_vnet import build_fused_forward
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    fused, fv = build_fused_forward(net, variables, dtype=jnp.bfloat16)
    out = np.asarray(fused(fv, x))
    agree = np.mean(np.argmax(out, -1) == np.argmax(ref, -1))
    assert agree > 0.98
    f32_fn, f32_fv = build_fused_forward(net, variables, dtype=jnp.bfloat16,
                                         accum="f32")
    np.testing.assert_allclose(out, np.asarray(f32_fn(f32_fv, x)), atol=0.05)
    with pytest.raises(ValueError):
        build_fused_forward(net, variables, dtype=jnp.float32, accum="bf16")


def test_fused_forward_pallas_thin_width_falls_back():
    """use_pallas builds must not route widths < 8 into the Mosaic kernel
    (it needs >= 8 x-positions): a shallow net whose stem sees W=4 still
    matches the flax forward because run_conv falls back to XLA there."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.fused_vnet import build_fused_forward
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4,
                          down_convs=(1,), up_convs=(1,))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = net.apply(variables, x, train=False)
    fused, fv = build_fused_forward(net, variables, dtype=jnp.float32,
                                    use_pallas=True, interpret=True)
    out = fused(fv, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)


@pytest.mark.parametrize("ht", [8, 16])
def test_parity_h_tiled(ht):
    """Explicit y-tiling (slab-plane mode) matches the untiled kernel/XLA,
    including when H is not a multiple of the tile."""
    _check_ht(1, 4, 32, 16, 16, 16, ht)
    _check_ht(1, 4, 24, 16, 16, 16, ht)  # H=24: ht=16 -> padded tile


def _check_ht(B, D, H, W, cin, cout, ht):
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = pc.thin_conv3d_reference(x, w, b, "relu")
    out = pc.thin_conv3d(x, w, b, act="relu", out_dtype=jnp.float32,
                         interpret=True, ht=ht)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)


def test_pick_ht_budget():
    """Auto tile height: big slab planes split, small planes stay whole."""
    assert pc._pick_ht(96, 96, 16, 16) == 96
    ht = pc._pick_ht(512, 512, 16, 16)
    assert ht < 512 and ht >= 8 and (ht & (ht - 1)) == 0
    # working set must fit the budget
    assert (6 * 512 * 16 + 2 * 512 * 16) * 2 * (ht + 2) <= 10_000_000


@pytest.mark.parametrize("acts", [("relu", "relu"), ("prelu", "prelu")])
def test_fused_residual_block(acts):
    """residual= fuses act2(x + act(conv(x)+b)) into one kernel pass."""
    act, res = acts
    cin = cout = 16
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = pc.thin_conv3d_reference(x, w, b, act, alpha=0.1,
                                   residual=res, res_alpha=0.3)
    out = pc.thin_conv3d(x, w, b, act=act, alpha=0.1, out_dtype=jnp.float32,
                         interpret=True, residual=res, res_alpha=0.3)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)


def test_fused_residual_requires_matching_channels():
    x = jnp.zeros((1, 4, 8, 16, 8), jnp.float32)
    w = jnp.zeros((3, 3, 3, 8, 16), jnp.float32)
    with pytest.raises(ValueError, match="cin == cout"):
        pc.thin_conv3d(x, w, residual="relu", interpret=True)


def test_parity_zchunked_path(monkeypatch):
    """Volumes whose tiled operand would exceed the remote-compile size cap
    split into overlapping z-chunks; result identical to the direct path."""
    import segmentation3d_tpu.ops.pallas_conv as mod
    monkeypatch.setattr(mod, "_REMOTE_OPERAND_BYTE_CAP", 100_000)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 16, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    ref = pc.thin_conv3d_reference(x, w, b, "relu", residual="relu")
    out = pc.thin_conv3d(x, w, b, act="relu", residual="relu",
                         out_dtype=jnp.float32, interpret=True, ht=8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.05)
