"""Losses computed directly on the packed channels-minor probability layout.

Why this exists: the packed-domain training forward
(``models/packed_train.py``) keeps every activation in the x-packed
``[B, D, H, W/P, P*C]`` form so the thin V-Net channel counts fill the
MXU's 128 lanes. But the LOSS was still computed on the unpacked
``[B, D, H, W, num_class]`` probabilities — and with ``num_class`` ∈
{2, 3, 4}, every elementwise op in the Dice forward/backward runs on a
tensor whose minor dim is lane-padded 128/num_class ≈ 32-64x. Profiled on
the config-#3 train step (96³, batch 8, bf16, TPU v5e): the single ``p*p``
multiply of the Dice denominator was 16.2 ms — the LARGEST op in the whole
step — plus ~15 ms of reshapes/layout copies converting between the packed
head output and the unpacked loss layout, out of a 169 ms step.

These implementations compute the IDENTICAL scalars (same sums, f32
reductions; parity-tested against ``dice.multi_dice_loss`` /
``focal.focal_loss``) with every large tensor kept in the
``[B, D, H, W/P, P*num_class]`` packed form (x-major channel order,
``channel = xo*num_class + c`` — the packed head's native output), so the
minor dim is ~96-128 and nothing materializes a thin-channel layout.

Reference semantics: ``segmentation3d/loss/multi_dice_loss.py`` (≈L35-80)
and ``segmentation3d/loss/focal_loss.py`` (≈L5-70) — this is a layout
rewrite of the same math, not a new loss.
"""
from __future__ import annotations

import jax.numpy as jnp

from segmentation3d_tpu.losses.dice import EPS, MultiDiceLoss
from segmentation3d_tpu.losses.focal import FocalLoss


def packed_onehot(seg, P: int, num_class: int, dtype=jnp.float32):
    """One-hot target in the packed x-major layout.

    ``seg``: [B, D, H, W] integer labels with W % P == 0. Returns
    [B, D, H, W/P, P*num_class] with value 1 at channel
    ``xo*num_class + seg[.., wq*P + xo]``. Built without ever
    materializing a minor-dim-``num_class`` tensor: the packed labels are
    repeated ``num_class``-fold along the (wide) minor dim and compared
    against a tiled class iota — one fused compare.
    """
    B, D, H, W = seg.shape
    assert W % P == 0, (W, P)
    segp = seg.astype(jnp.int32).reshape(B, D, H, W // P, P)
    rep = jnp.repeat(segp, num_class, axis=-1)      # [.., P*nc], label value
    cls = jnp.tile(jnp.arange(num_class, dtype=jnp.int32), P)
    return (rep == cls).astype(dtype)


def multi_dice_loss_packed(prob_packed, seg, P: int, num_class: int,
                           weights=None, eps: float = EPS):
    """``dice.multi_dice_loss`` on packed probabilities.

    ``prob_packed``: [B, D, H, W/P, P*num_class] softmax probabilities in
    x-major packed order. ``seg``: [B, D, H, W] labels. Returns
    ``(loss, per_class_dice)`` — the same values as the unpacked form
    (per-sample spatial sums are permutation-invariant).
    """
    B = prob_packed.shape[0]
    g = packed_onehot(seg, P, num_class, prob_packed.dtype)
    red = (1, 2, 3)
    inter = jnp.sum(prob_packed * g, axis=red)               # [B, P*nc]
    p2 = jnp.sum(prob_packed * prob_packed, axis=red)
    g2 = jnp.sum(g, axis=red)                                # one-hot: g² = g

    def fold(x):  # [B, P*nc] -> [B, nc]: sum the P x-offsets per class
        return x.reshape(B, P, num_class).sum(axis=1)

    inter, p2, g2 = fold(inter), fold(p2), fold(g2)
    dice = jnp.mean((2.0 * inter + eps) / (p2 + g2 + eps), axis=0)  # [nc]
    if weights is None:
        w = jnp.ones((num_class,), prob_packed.dtype) / num_class
    else:
        w = jnp.asarray(weights, prob_packed.dtype)
        w = w / jnp.sum(w)
    return 1.0 - jnp.sum(w * dice), dice


def focal_loss_packed(prob_packed, seg, P: int, num_class: int, alpha=None,
                      gamma: float = 2.0, eps: float = 1e-7):
    """``focal.focal_loss`` on packed probabilities (same scalar).

    mean over voxels of ``-alpha_c (1-p_c)^gamma log(p_c)`` at the true
    class — computed as an elementwise pass over the packed form masked by
    the packed one-hot, so per-voxel true-class selection never leaves the
    wide layout.
    """
    g = packed_onehot(seg, P, num_class, prob_packed.dtype)
    p = jnp.clip(prob_packed, eps, 1.0)
    if alpha is None:
        a = jnp.ones((num_class,), prob_packed.dtype)
    else:
        a = jnp.asarray(alpha, prob_packed.dtype)
        if a.ndim == 0:
            a = jnp.full((num_class,), a)
    at = jnp.tile(a, P)                                       # [P*nc]
    term = (-at) * jnp.power(1.0 - p, gamma) * jnp.log(p) * g
    n_vox = seg.size
    return jnp.sum(term) / n_vox


def make_packed_loss(loss_obj, P: int | None, num_class: int):
    """Packed twin of a reference loss object, or None if it has none.

    Returns ``fn(prob_packed, seg) -> scalar`` computing the same value as
    ``loss_obj(prob_unpacked, seg)``. The train loop uses this together
    with ``build_packed_train_apply(net, packed_probs=True)`` so the loss
    runs in the packed domain; any loss without a packed twin falls back
    to the unpacked head output. ``P=None`` infers the packing per call
    from the shapes (``W // cols`` — matches the forward's adaptive head
    packing, ``ops.packed_conv.head_p_for``).
    """
    def p_of(prob_packed, seg):
        return P if P is not None else seg.shape[3] // prob_packed.shape[3]

    if isinstance(loss_obj, MultiDiceLoss):
        weights, eps = loss_obj.weights, loss_obj.eps

        def dice_fn(prob_packed, seg):
            loss, _ = multi_dice_loss_packed(
                prob_packed, seg, p_of(prob_packed, seg), num_class,
                weights, eps)
            return loss
        return dice_fn
    if isinstance(loss_obj, FocalLoss):
        alpha, gamma = loss_obj.alpha, loss_obj.gamma

        def focal_fn(prob_packed, seg):
            return focal_loss_packed(prob_packed, seg,
                                     p_of(prob_packed, seg), num_class,
                                     alpha, gamma)
        return focal_fn
    return None
