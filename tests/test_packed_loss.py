"""Packed-domain losses (losses/packed.py): exact parity with the unpacked
Dice/Focal forms, and end-to-end equivalence of the packed-loss train step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.losses import MultiDiceLoss, FocalLoss
from segmentation3d_tpu.losses.dice import multi_dice_loss
from segmentation3d_tpu.losses.focal import focal_loss
from segmentation3d_tpu.losses.packed import (
    packed_onehot, multi_dice_loss_packed, focal_loss_packed, make_packed_loss)

rng = np.random.default_rng(7)


def _pack(probs, P):
    """[B,D,H,W,nc] -> x-major packed [B,D,H,W/P,P*nc]."""
    B, D, H, W, nc = probs.shape
    return probs.reshape(B, D, H, W // P, P * nc)


def _rand_probs(shape=(2, 6, 6, 16), nc=3):
    logits = rng.normal(size=shape + (nc,)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    seg = jnp.asarray(rng.integers(0, nc, size=shape), jnp.int32)
    return probs, seg


def test_packed_onehot_matches_eye():
    nc, P = 3, 4
    seg = jnp.asarray(rng.integers(0, nc, size=(2, 5, 6, 8)), jnp.int32)
    ref = jnp.eye(nc, dtype=jnp.float32)[seg]           # [B,D,H,W,nc]
    got = packed_onehot(seg, P, nc)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_pack(ref, P)))


@pytest.mark.parametrize("weights", [None, [1.0, 2.0, 0.5]])
def test_dice_parity(weights):
    nc, P = 3, 8
    probs, seg = _rand_probs(nc=nc)
    ref_loss, ref_dice = multi_dice_loss(probs, seg, weights)
    got_loss, got_dice = multi_dice_loss_packed(_pack(probs, P), seg, P, nc,
                                                weights)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dice), np.asarray(ref_dice),
                               rtol=1e-6)


@pytest.mark.parametrize("alpha", [None, 0.25, [0.75, 0.25, 0.25]])
def test_focal_parity(alpha):
    nc, P = 3, 4
    probs, seg = _rand_probs(nc=nc)
    ref = focal_loss(probs, seg, alpha=alpha, gamma=2.0)
    got = focal_loss_packed(_pack(probs, P), seg, P, nc, alpha=alpha,
                            gamma=2.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_make_packed_loss_dispatch():
    assert make_packed_loss(MultiDiceLoss(num_class=2), 32, 2) is not None
    assert make_packed_loss(FocalLoss(2, alpha=0.25), 32, 2) is not None
    assert make_packed_loss(object(), 32, 2) is None


def test_packed_probs_apply_consistency():
    """build_packed_train_apply(packed_probs=True) returns the same values
    as the unpacked output, just in packed layout."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.packed_train import build_packed_train_apply
    from segmentation3d_tpu.ops.packed_conv import pick_window_p
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=8)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    flat = build_packed_train_apply(net)(variables, x, train=False)
    packed = build_packed_train_apply(net, packed_probs=True)(
        variables, x, train=False)
    Ph = pick_window_p(2)
    np.testing.assert_array_equal(np.asarray(_pack(flat, Ph)),
                                  np.asarray(packed))


@pytest.mark.slow
def test_train_step_packed_loss_equivalence():
    """Same loss value and gradients whether the Dice loss runs on the
    unpacked or the packed head output."""
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.packed_train import build_packed_train_apply
    from segmentation3d_tpu.ops.packed_conv import pick_window_p
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=8)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32, 1)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 2, size=x.shape[:4]), jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    loss_fn = MultiDiceLoss(num_class=2)
    ploss = make_packed_loss(loss_fn, pick_window_p(2), 2)
    flat_apply = build_packed_train_apply(net)
    packed_apply = build_packed_train_apply(net, packed_probs=True)

    def loss_of(apply, lf, p):
        probs, _ = apply({"params": p,
                          "batch_stats": variables["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return lf(probs, seg)

    l1, g1 = jax.value_and_grad(
        lambda p: loss_of(flat_apply, loss_fn, p))(variables["params"])
    l2, g2 = jax.value_and_grad(
        lambda p: loss_of(packed_apply, ploss, p))(variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        np.testing.assert_allclose(np.asarray(flat2[path]), np.asarray(leaf),
                                   rtol=1e-3, atol=1e-5, err_msg=str(path))
