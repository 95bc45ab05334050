"""Intensity normalizers (device-side).

Re-implements ``segmentation3d/utils/normalizer.py``:
``FixedNormalizer(mean, stddev, clip)`` (≈L1-45) and
``AdaptiveNormalizer(min_p, max_p, clip)`` (≈L46-90), including the
``to_dict``/``from_dict`` round-trip that the reference embeds in checkpoints
so inference reconstructs the exact normalizer without the training config
(see checkpoint key ``crop_normalizers``, ``utils/model_io.py``).

Both operate on jax arrays and are jit-friendly (pure element-wise /
percentile math), so they fuse into the device-side preprocessing graph.
"""
from __future__ import annotations

import jax.numpy as jnp


class FixedNormalizer:
    """``(x - mean) / stddev``, optionally clipped to [-1, 1]."""

    def __init__(self, mean, stddev, clip=True):
        assert stddev > 0, "stddev must be positive"
        self.mean = float(mean)
        self.stddev = float(stddev)
        self.clip = bool(clip)

    def __call__(self, x):
        x = (jnp.asarray(x, jnp.float32) - self.mean) / self.stddev
        if self.clip:
            x = jnp.clip(x, -1.0, 1.0)
        return x

    def to_dict(self):
        return {"type": 0, "mean": self.mean, "stddev": self.stddev, "clip": self.clip}

    @staticmethod
    def from_dict(d):
        return FixedNormalizer(d["mean"], d["stddev"], d["clip"])


class AdaptiveNormalizer:
    """Percentile-window rescale to [-1, 1].

    The intensity window ``[P(min_p), P(max_p)]`` (percentiles of the volume,
    default 0.1% / 99.9%) is mapped linearly onto [-1, 1]; values outside are
    clipped when ``clip`` is set. Percentiles are computed on device.
    """

    def __init__(self, min_p=0.001, max_p=0.999, clip=True):
        assert 0 <= min_p < max_p <= 1, "percentiles must satisfy 0 <= min_p < max_p <= 1"
        self.min_p = float(min_p)
        self.max_p = float(max_p)
        self.clip = bool(clip)

    def __call__(self, x, stats_of=None):
        """``stats_of``: optional array to compute the percentile window on
        (e.g. the unpadded region of a padded volume); defaults to ``x``."""
        x = jnp.asarray(x, jnp.float32)
        src = x if stats_of is None else jnp.asarray(stats_of, jnp.float32)
        lo = jnp.percentile(src, self.min_p * 100.0)
        hi = jnp.percentile(src, self.max_p * 100.0)
        scale = jnp.maximum(hi - lo, 1e-8)
        x = (x - lo) / scale * 2.0 - 1.0
        if self.clip:
            x = jnp.clip(x, -1.0, 1.0)
        return x

    def to_dict(self):
        return {"type": 1, "min_p": self.min_p, "max_p": self.max_p, "clip": self.clip}

    @staticmethod
    def from_dict(d):
        return AdaptiveNormalizer(d["min_p"], d["max_p"], d["clip"])


def normalizer_from_dict(d):
    """Reconstruct a normalizer from its checkpoint payload (type tag 0/1)."""
    t = d.get("type")
    if t == 0:
        return FixedNormalizer.from_dict(d)
    if t == 1:
        return AdaptiveNormalizer.from_dict(d)
    raise ValueError(f"unknown normalizer type: {d}")
