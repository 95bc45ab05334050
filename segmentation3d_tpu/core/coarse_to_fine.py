"""Coarse-to-fine two-pass segmentation.

The reference handles "volume too big" with a documented usage pattern
(SURVEY.md §5 long-context row): train a low-resolution whole-volume model,
then a high-resolution model, run them as two ``seg_infer`` passes and crop
the second to the first's region of interest. This module makes that a
first-class pipeline:

1. coarse pass: resample the whole volume to the coarse model's spacing,
   single forward (DISABLE partition) -> low-res mask;
2. ROI: bounding box of the coarse foreground + margin (world-space);
3. fine pass: sliding-window only inside the ROI at fine spacing;
4. paste: fine labels into a full-size native-frame mask (background
   elsewhere).

For a whole-body 512^3 CT where the organ ROI is a small fraction of the
volume this cuts fine-pass compute by the volume ratio — the TPU-native
answer to driver benchmark config #5.
"""
from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.core.seg_infer import (
    SegModel, load_seg_model, find_cases, IMAGE_EXTS,
)
from segmentation3d_tpu.io import Volume, read_image, write_image
from segmentation3d_tpu.ops.geometry import Frame, resampled_frame
from segmentation3d_tpu.ops.resample import (
    resample_spacing, resample_to_frame, LINEAR, NN,
)


def roi_from_mask(mask_zyx: np.ndarray, frame: Frame, margin_mm: float = 16.0):
    """World-space bounding box (lo_xyz, hi_xyz) of mask foreground + margin.
    Returns None if the mask is empty."""
    nz = np.nonzero(mask_zyx > 0)
    if nz[0].size == 0:
        return None
    lo_idx = np.array([nz[2].min(), nz[1].min(), nz[0].min()], np.float64)
    hi_idx = np.array([nz[2].max(), nz[1].max(), nz[0].max()], np.float64)
    corners = []
    for ix in (lo_idx[0], hi_idx[0]):
        for iy in (lo_idx[1], hi_idx[1]):
            for iz in (lo_idx[2], hi_idx[2]):
                corners.append(frame.index_to_world([ix, iy, iz]))
    corners = np.asarray(corners)
    return corners.min(axis=0) - margin_mm, corners.max(axis=0) + margin_mm


def _fine_grid_for_roi(lo_xyz, hi_xyz, native: Volume, spacing, max_stride):
    """Fine-pass frame/size covering the ROI (clipped to the native volume),
    dims padded to x max_stride."""
    nat_lo = native.frame.index_to_world([0.0, 0.0, 0.0])
    nat_hi = native.frame.index_to_world(native.size_xyz - 1.0)
    lo = np.maximum(np.minimum(nat_lo, nat_hi), lo_xyz)
    hi = np.minimum(np.maximum(nat_lo, nat_hi), hi_xyz)
    spacing = np.asarray(spacing, np.float64)
    size = np.maximum(np.ceil((hi - lo) / spacing).astype(np.int64), 1)
    size = (np.ceil(size / max_stride) * max_stride).astype(np.int64)
    frame = Frame(lo, spacing, native.frame.direction)
    return frame, size


def segment_case_coarse_to_fine(
        coarse: SegModel, fine: SegModel, image_paths,
        coarse_inferer_cache: dict, fine_inferer: SlidingWindowInferer,
        patch_size_zyx, stride_zyx=None, margin_mm: float = 16.0,
        fill_value: float = 0.0):
    """Two-pass segmentation of one case -> (mask Volume, seconds, roi)."""
    t0 = time.time()
    vols = [read_image(p, dtype=np.float32) for p in image_paths]
    native = vols[0]

    # ---- pass 1: coarse whole-volume ---------------------------------------
    chans = []
    c_frame = None
    for mi, v in enumerate(vols):
        iso, c_frame, c_size = resample_spacing(
            v.data, v.frame, coarse.spacing, pad_to_multiple=coarse.max_stride,
            interp=coarse.interpolation, fill=fill_value)
        if coarse.normalizers[mi] is not None:
            iso = coarse.normalizers[mi](iso)
        chans.append(iso)
    cvol = jnp.stack(chans, axis=-1)
    key = cvol.shape[:3]
    if key not in coarse_inferer_cache:
        coarse_inferer_cache[key] = SlidingWindowInferer(
            coarse.net, key, coarse.out_channels, batch_size=1,
            blend="constant", apply_fn=getattr(coarse, "fused_apply", None),
            apply_vars=getattr(coarse, "fused_vars", None))
    coarse_mask = np.asarray(coarse_inferer_cache[key](coarse.variables, cvol))

    roi = roi_from_mask(coarse_mask, c_frame, margin_mm)
    out_mask = np.zeros(native.data.shape, np.uint8)
    if roi is None:
        return Volume(out_mask, native.frame), time.time() - t0, None

    # ---- pass 2: fine sliding-window inside the ROI ------------------------
    f_frame, f_size = _fine_grid_for_roi(roi[0], roi[1], native,
                                         fine.spacing, fine.max_stride)
    # patches must fit the ROI grid
    f_size_zyx = np.maximum(f_size[::-1], np.asarray(patch_size_zyx))
    f_size = f_size_zyx[::-1].copy()
    chans = []
    for mi, v in enumerate(vols):
        roi_vol = resample_to_frame(v.data, v.frame, f_frame, f_size,
                                    interp=fine.interpolation, fill=fill_value)
        if fine.normalizers[mi] is not None:
            roi_vol = fine.normalizers[mi](roi_vol)
        chans.append(roi_vol)
    fvol = jnp.stack(chans, axis=-1)
    fine_mask = fine_inferer(fine.variables, fvol, stride_zyx=stride_zyx)

    # ---- paste fine labels back into the native frame ----------------------
    pasted = resample_to_frame(fine_mask.astype(jnp.int32), f_frame,
                               native.frame, native.size_xyz, interp=NN)
    out_mask = np.asarray(pasted).astype(np.uint8)
    return Volume(out_mask, native.frame), time.time() - t0, roi


_C2F_SESSIONS: dict = {}


def _build_c2f_session(coarse_model_dir, fine_model_dir, dtype, patch,
                       stride, batch_size, quant=None, act_clip=8.0,
                       calib_paths=None, tta=()):
    """Load both models, attach fused forwards, build the fine inferer.

    ``quant="int8"`` quantizes the FINE model's packed forward (the fine
    pass dominates the two-pass time); the coarse pass keeps full
    precision (its whole-volume widths are only known per case, so it uses
    the window forward, which has no quantized form). ``calib_paths``
    calibrates the fine model's activation scales on a representative image
    (one per modality), exactly like ``seg_infer --int8_calib``.
    Misconfiguration raises — never a silent full-precision run."""
    coarse = load_seg_model(coarse_model_dir, dtype=dtype)
    fine = load_seg_model(fine_model_dir, dtype=dtype)
    calib = None
    if calib_paths is not None:
        if quant is None:
            raise ValueError("calib_image only applies with quant")
        from segmentation3d_tpu.core.seg_infer import _calibrate_for_model
        calib = _calibrate_for_model(fine, calib_paths, dtype)

    def attach_fused(model, patch_w, q=None):
        """Attach the packed-domain (or window) fused forward to a SegModel
        (consumed via the ``fused_apply``/``fused_vars`` attributes)."""
        import jax
        if dtype != jnp.bfloat16 or jax.default_backend() == "cpu":
            if q is not None:
                raise ValueError("quant requires bfloat16 dtype on TPU")
            return
        try:
            from segmentation3d_tpu.models.packed_vnet import _p_for
            if patch_w % _p_for(model.net.base_channels) == 0:
                from segmentation3d_tpu.models.packed_vnet import (
                    build_packed_forward)
                from segmentation3d_tpu.ops.packed_conv import head_p_for
                model.fused_apply, model.fused_vars = build_packed_forward(
                    model.net, model.variables, dtype=dtype,
                    head_p=head_p_for(patch_w, model.net.out_channels),
                    quant=q, act_clip=act_clip,
                    calib=calib if q is not None else None)
            else:
                if q is not None:
                    raise ValueError(
                        f"quant={q!r} requires the packed-domain forward, "
                        f"but patch width {patch_w} is not divisible by its "
                        "in_block packing")
                from segmentation3d_tpu.models.fused_vnet import (
                    build_fused_forward)
                model.fused_apply, model.fused_vars = build_fused_forward(
                    model.net, model.variables, dtype=dtype)
        except (NotImplementedError, KeyError, AssertionError):
            if q is not None:
                raise ValueError(
                    f"quant={q!r} requires the packed-domain forward, "
                    "which this architecture does not support")

    attach_fused(fine, patch[2], q=quant)
    # coarse pass volumes are whole downsampled volumes bucketed to the
    # model stride; width divisibility is only known per case, so use the
    # window-conv fused forward (always valid)
    attach_fused(coarse, 1)
    # tta applies to the FINE pass only: the coarse pass exists to find the
    # ROI, where mirror averaging buys nothing the margin doesn't already
    fine_inferer = SlidingWindowInferer(
        fine.net, patch, fine.out_channels, batch_size=batch_size,
        blend="gaussian" if stride != patch else "constant",
        apply_fn=getattr(fine, "fused_apply", None),
        apply_vars=getattr(fine, "fused_vars", None), tta=tta)
    return {"coarse": coarse, "fine": fine, "fine_inferer": fine_inferer,
            "coarse_cache": {}}


def segmentation_coarse_to_fine(
        input_path, coarse_model_dir, fine_model_dir, output_dir,
        seg_name="seg.mha", partition_size=(96, 96, 96),
        partition_stride=None, batch_size=8, margin_mm=16.0,
        dtype=jnp.float32, save_image=False, quant=None, act_clip=8.0,
        calib_image=None, tta=None):
    """Batch driver mirroring ``core.seg_infer.segmentation`` for the
    two-pass pipeline. ``calib_image`` (path or per-modality path list)
    calibrates the quantized fine model like ``seg_infer --int8_calib``;
    ``tta`` mirror-averages the fine pass like ``seg_infer --tta``."""
    from segmentation3d_tpu.core.infer_engine import tta_axes
    tta = tta_axes(tta)
    cases = find_cases(input_path)
    os.makedirs(output_dir, exist_ok=True)

    patch = tuple(int(v) for v in np.asarray(partition_size)[::-1])
    stride = tuple(int(v) for v in np.asarray(partition_stride)[::-1]) \
        if partition_stride is not None else patch

    # session reuse across calls (same rationale as seg_infer._SESSIONS:
    # re-created inferers force a full retrace+recompile per call)
    from segmentation3d_tpu.utils import model_io as _mio
    def _ck(d):
        c = _mio.latest_checkpoint(d)
        return (c, os.path.getmtime(os.path.join(c, "params.pth")))
    calib_paths = None
    if calib_image is not None:
        calib_paths = tuple(calib_image) if isinstance(
            calib_image, (list, tuple)) else (calib_image,)
        if quant is None:
            raise ValueError("calib_image only applies with quant")
    skey = (_ck(coarse_model_dir), _ck(fine_model_dir),
            jnp.dtype(dtype).name, patch, stride, int(batch_size),
            quant, float(act_clip), calib_paths, tta)
    sess = _C2F_SESSIONS.get(skey)
    if sess is None:
        while len(_C2F_SESSIONS) >= 2:
            _C2F_SESSIONS.pop(next(iter(_C2F_SESSIONS)))
        sess = _build_c2f_session(coarse_model_dir, fine_model_dir, dtype,
                                  patch, stride, batch_size, quant=quant,
                                  act_clip=act_clip, calib_paths=calib_paths,
                                  tta=tta)
        _C2F_SESSIONS[skey] = sess
    coarse, fine = sess["coarse"], sess["fine"]
    fine_inferer, coarse_cache = sess["fine_inferer"], sess["coarse_cache"]

    results = []
    failures = []
    for image_paths in cases:
        name = os.path.basename(image_paths[0])
        for suf in IMAGE_EXTS:
            if name.endswith(suf):
                name = name[: -len(suf)]
                break
        try:
            mask_vol, secs, roi = segment_case_coarse_to_fine(
                coarse, fine, image_paths, coarse_cache, fine_inferer,
                patch, stride, margin_mm)
            case_dir = os.path.join(output_dir, name)
            write_image(mask_vol, os.path.join(case_dir, seg_name))
            if save_image:
                write_image(read_image(image_paths[0]),
                            os.path.join(case_dir, "org.mha"))
        except Exception as e:  # one bad case must not abort the batch run
            print(f"ERROR: coarse-to-fine segmentation of {name} failed: {e}")
            failures.append((name, e))
            continue
        print(f"coarse-to-fine segmentation of {name}: {secs:.2f} s "
              f"(roi={'found' if roi is not None else 'empty'})")
        results.append((name, secs))
    if failures and not results:
        raise failures[0][1]  # everything failed: not a per-case hiccup
    return results
