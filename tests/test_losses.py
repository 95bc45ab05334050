import numpy as np
import jax.numpy as jnp
import torch

from segmentation3d_tpu.losses import (
    BinaryDiceLoss, MultiDiceLoss, FocalLoss, multi_dice_loss, focal_loss, create_loss,
)


def _torch_multi_dice(probs, target, weights, num_class):
    """Reference formula (SURVEY.md C14): squared-denominator V-Net soft Dice,
    one-hot target, per-class weights — implemented independently in torch."""
    p = torch.tensor(probs).reshape(probs.shape[0], -1, num_class)
    t = torch.tensor(target).reshape(target.shape[0], -1).long()
    onehot = torch.nn.functional.one_hot(t, num_class).double()
    p = p.double()
    eps = 1.0
    inter = (p * onehot).sum(dim=1)
    denom = (p * p).sum(dim=1) + (onehot * onehot).sum(dim=1)
    dice = ((2 * inter + eps) / (denom + eps)).mean(dim=0)
    w = torch.tensor(weights, dtype=torch.double)
    w = w / w.sum()
    return float(1.0 - (w * dice).sum())


def _torch_focal(probs, target, alpha, gamma):
    num_class = probs.shape[-1]
    p = torch.tensor(probs).double().reshape(-1, num_class)
    t = torch.tensor(target).long().reshape(-1)
    pt = p.gather(1, t[:, None]).squeeze(1).clamp(1e-7, 1.0)
    a = torch.tensor(alpha, dtype=torch.double)[t]
    return float((-a * (1 - pt) ** gamma * pt.log()).mean())


def _rand_probs(shape=(2, 8, 8, 8), num_class=3, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=shape + (num_class,)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    target = rng.integers(0, num_class, size=shape).astype(np.int32)
    return probs, target


def test_multi_dice_vs_torch():
    probs, target = _rand_probs()
    weights = [1.0, 3.0, 2.0]
    ours = float(MultiDiceLoss(weights, 3)(jnp.asarray(probs), jnp.asarray(target)))
    ref = _torch_multi_dice(probs, target, weights, 3)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_focal_vs_torch():
    probs, target = _rand_probs(seed=1)
    alpha = [0.75, 0.25, 0.25]
    ours = float(FocalLoss(3, alpha, 2.0)(jnp.asarray(probs), jnp.asarray(target)))
    ref = _torch_focal(probs, target, alpha, 2.0)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_perfect_prediction_dice_near_zero():
    target = np.zeros((1, 8, 8, 8), np.int32)
    target[:, 2:6, 2:6, 2:6] = 1
    probs = np.eye(2, dtype=np.float32)[target]
    loss, dice = multi_dice_loss(jnp.asarray(probs), jnp.asarray(target))
    assert float(loss) < 0.01
    assert np.all(np.asarray(dice) > 0.99)


def test_binary_dice_loss_bounds():
    probs, target = _rand_probs(num_class=2)
    l = float(BinaryDiceLoss()(jnp.asarray(probs[..., 1]), jnp.asarray(target == 1)))
    assert 0.0 <= l <= 1.0


def test_focal_perfect_prediction_near_zero():
    target = np.zeros((1, 4, 4, 4), np.int32)
    probs = np.eye(2, dtype=np.float32)[target]
    assert float(focal_loss(jnp.asarray(probs), jnp.asarray(target))) < 1e-5


def test_create_loss_by_config_name():
    class NS:
        pass
    cfg = NS(); cfg.name = "Focal"; cfg.focal_obj_alpha = 0.25; cfg.focal_gamma = 2.0
    f = create_loss(cfg, 3)
    assert isinstance(f, FocalLoss) and f.alpha == [0.75, 0.25, 0.25]
    cfg2 = NS(); cfg2.name = "Dice"; cfg2.obj_weight = [1, 2, 2]
    d = create_loss(cfg2, 3)
    assert isinstance(d, MultiDiceLoss)
    import pytest
    cfg3 = NS(); cfg3.name = "CrossEntropy"
    with pytest.raises(ValueError):
        create_loss(cfg3, 3)


def test_losses_differentiable():
    import jax
    probs, target = _rand_probs(shape=(1, 4, 4, 4))

    def f(logits):
        p = jax.nn.softmax(logits, -1)
        l1, _ = multi_dice_loss(p, jnp.asarray(target))
        return l1 + focal_loss(p, jnp.asarray(target), [1.0, 1.0, 1.0], 2.0)

    g = jax.grad(f)(jnp.asarray(np.log(probs + 1e-8)))
    assert np.all(np.isfinite(np.asarray(g)))
