"""Focal loss on softmax probabilities.

Re-implements ``segmentation3d/loss/focal_loss.py:FocalLoss(class_num, alpha,
gamma)`` (≈L5-70): operates directly on the net's output probabilities
(the V-Net here emits softmax, not logits), with per-class ``alpha`` weights
and focusing parameter ``gamma`` (default 2):

    loss = mean over voxels of  -alpha_c * (1 - p_c)^gamma * log(p_c)

where ``c`` is the true class of each voxel.
"""
from __future__ import annotations

import jax.numpy as jnp


def focal_loss(probs, target, alpha=None, gamma: float = 2.0, eps: float = 1e-7):
    """``probs``: [B, ..., C] probabilities; ``target``: [B, ...] int labels."""
    num_class = probs.shape[-1]
    if target.ndim == probs.ndim:
        target = target[..., 0]
    target = target.astype(jnp.int32)
    onehot = jnp.eye(num_class, dtype=probs.dtype)[target]
    pt = jnp.sum(probs * onehot, axis=-1)          # prob of the true class
    pt = jnp.clip(pt, eps, 1.0)
    if alpha is None:
        a = jnp.ones((num_class,), probs.dtype)
    else:
        a = jnp.asarray(alpha, probs.dtype)
        if a.ndim == 0:
            a = jnp.full((num_class,), a)
    at = a[target]
    return jnp.mean(-at * jnp.power(1.0 - pt, gamma) * jnp.log(pt))


class FocalLoss:
    """Reference-API focal loss: ``FocalLoss(class_num, alpha, gamma)``."""

    def __init__(self, class_num: int, alpha=None, gamma: float = 2.0):
        self.class_num = class_num
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, probs, target):
        return focal_loss(probs, target, self.alpha, self.gamma)
