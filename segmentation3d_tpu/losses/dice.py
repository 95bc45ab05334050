"""Soft Dice losses (V-Net form, squared denominator).

Re-implements ``segmentation3d/loss/multi_dice_loss.py``:
``BinaryDiceLoss`` (≈L5-30) and ``MultiDiceLoss(weights, num_class)``
(≈L35-80). The Dice term uses the squared-denominator V-Net formulation
``2·Σ(p·g) / (Σp² + Σg²)`` per class on the net's softmax probabilities, with
a one-hot target and per-class weights. Loss = 1 - weighted mean Dice.

Functional forms (``binary_dice``, ``multi_dice_loss``) are jit/grad-friendly;
the classes mirror the reference's call API for config parity.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1.0  # smoothing term in both numerator and denominator (V-Net style)


def binary_dice(probs, target, eps: float = EPS):
    """Soft Dice coefficient over the whole array (single class).

    ``probs``: predicted foreground probabilities, any shape.
    ``target``: binary ground truth, same shape.
    """
    probs = probs.reshape(probs.shape[0], -1) if probs.ndim > 1 else probs[None]
    target = target.reshape(target.shape[0], -1) if target.ndim > 1 else target[None]
    target = target.astype(probs.dtype)
    inter = jnp.sum(probs * target, axis=-1)
    denom = jnp.sum(probs * probs, axis=-1) + jnp.sum(target * target, axis=-1)
    return jnp.mean((2.0 * inter + eps) / (denom + eps))


def multi_dice_loss(probs, target, weights=None, eps: float = EPS):
    """Weighted multi-class soft Dice loss.

    ``probs``: [B, ..., C] per-class probabilities (channels last).
    ``target``: [B, ...] integer labels (or [B, ..., 1]).
    ``weights``: per-class weights (default uniform).
    Returns ``(loss, per_class_dice)``.
    """
    num_class = probs.shape[-1]
    if target.ndim == probs.ndim:
        target = target[..., 0]
    target = target.astype(jnp.int32)
    onehot = jnp.eye(num_class, dtype=probs.dtype)[target]  # [B, ..., C]
    p = probs.reshape(probs.shape[0], -1, num_class)
    g = onehot.reshape(onehot.shape[0], -1, num_class)
    inter = jnp.sum(p * g, axis=1)        # [B, C]
    denom = jnp.sum(p * p, axis=1) + jnp.sum(g * g, axis=1)
    dice = jnp.mean((2.0 * inter + eps) / (denom + eps), axis=0)  # [C]
    if weights is None:
        w = jnp.ones((num_class,), probs.dtype) / num_class
    else:
        w = jnp.asarray(weights, probs.dtype)
        w = w / jnp.sum(w)
    return 1.0 - jnp.sum(w * dice), dice


class BinaryDiceLoss:
    """1 - soft Dice on a single foreground channel."""

    def __init__(self, eps: float = EPS):
        self.eps = eps

    def __call__(self, probs, target):
        return 1.0 - binary_dice(probs, target, self.eps)


class MultiDiceLoss:
    """Reference-API multi-class Dice loss: ``MultiDiceLoss(weights, num_class)``."""

    def __init__(self, weights=None, num_class: int | None = None, eps: float = EPS):
        self.weights = weights
        self.num_class = num_class
        self.eps = eps

    def __call__(self, probs, target):
        loss, _ = multi_dice_loss(probs, target, self.weights, self.eps)
        return loss
