"""In-training validation (additive — the reference logs train loss only,
SURVEY.md C10): whole-volume inference on a held-out case list at every
checkpoint, reporting per-class Dice.

Relay-aware design (CLAUDE.md: every distinct compiled program costs
seconds-to-minutes of first-call latency): cases are padded up to
``shape_bucket`` multiples and inference runs through a cached
:class:`~segmentation3d_tpu.core.infer_engine.SlidingWindowInferer` per
bucketed shape, with the live params passed as jit ARGUMENTS — so a
heterogeneous validation set compiles one program per shape bucket for the
whole training run, not one per (case, save point).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.io import read_image
from segmentation3d_tpu.ops.geometry import resampled_frame
from segmentation3d_tpu.ops.resample import resample_plan, resample_exec, NN
from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer


def validate_cases(net, variables, val_list, *, spacing, interpolation,
                   normalizers, num_classes, max_stride, shape_bucket=32,
                   inferer_cache=None):
    """Run whole-volume inference on every case of ``val_list`` (train-format
    txt) and return ``(mean_dice, per_class_dice, n_cases)``.

    ``per_class_dice[c-1]`` is the mean Dice of class ``c`` over the cases;
    ``mean_dice`` averages the foreground classes (matching the round-2
    foreground-only number when ``num_classes == 2``).

    ``inferer_cache``: dict reused across calls so same-bucket cases share
    one compiled program (pass a fresh dict to opt out)."""
    from segmentation3d_tpu.dataloader.dataset import read_train_txt
    if inferer_cache is None:
        inferer_cache = {}
    pad_mult = max(int(max_stride), int(shape_bucket or 0))
    ims, sgs = read_train_txt(val_list)
    per_case = []
    for img_paths, seg_path in zip(ims, sgs):
        chans = []
        iso_frame = iso_size = valid = None
        for mi, pth in enumerate(img_paths):
            v = read_image(pth)
            if iso_frame is None:
                # all modalities co-registered onto modality-0's iso grid,
                # like the inference path (core/seg_infer.py)
                _, valid = resampled_frame(v.frame, v.size_xyz, spacing, 1)
                iso_frame, iso_size = resampled_frame(
                    v.frame, v.size_xyz, spacing, pad_mult)
            kind, coeffs, out_shape = resample_plan(v.frame, iso_frame, iso_size)
            iso = resample_exec(jnp.asarray(v.data), kind, coeffs, out_shape,
                                interp=interpolation, fill=0.0,
                                out_dtype=jnp.float32)
            norm = normalizers[mi] if normalizers is not None else None
            if isinstance(norm, AdaptiveNormalizer):
                # percentile stats from the VALID (pre-padding) region only —
                # bucket-padding fill must not skew the intensity window
                # (mirrors segmentation_one_case's valid_zyx handling)
                vz, vy, vx = int(valid[2]), int(valid[1]), int(valid[0])
                iso = norm(iso, stats_of=iso[:vz, :vy, :vx])
            elif norm is not None:
                iso = norm(iso)
            chans.append(iso)
        sv = read_image(seg_path)
        kind, coeffs, out_shape = resample_plan(sv.frame, iso_frame, iso_size)
        gt = resample_exec(jnp.asarray(sv.data).astype(jnp.int32), kind,
                           coeffs, out_shape, interp=NN, fill=0.0)
        vol = jnp.stack(chans, axis=-1)
        patch = tuple(int(s) for s in iso_size[::-1])
        if patch not in inferer_cache:
            inferer_cache[patch] = SlidingWindowInferer(
                net, patch, num_classes, batch_size=1, blend="constant")
        pred = np.asarray(inferer_cache[patch](variables, vol,
                                               stride_zyx=patch))
        g = np.asarray(gt)
        dices = []
        for c in range(1, num_classes):
            inter = float(np.logical_and(g == c, pred == c).sum())
            denom = float((g == c).sum() + (pred == c).sum())
            dices.append(2.0 * inter / max(denom, 1.0))
        per_case.append(dices)
    if not per_case:
        return 0.0, [], 0
    per_class = np.mean(np.asarray(per_case, np.float64), axis=0)
    return float(per_class.mean()), [float(d) for d in per_class], len(per_case)
