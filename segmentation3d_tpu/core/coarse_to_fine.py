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

Round-4: the batch driver shares the flat driver's production host
machinery (``core.seg_infer``, SURVEY §3.2 hot-spot analysis) instead of
the eager f32 host path it launched with:

- two-stage read-ahead (decode ∥ bit-packed stored-dtype H2D upload) and
  two-stage write-behind (deferred packed-mask D2H readback ∥ gzip write);
- BOTH passes preprocess through the fused ``_prep_modality`` program
  (unpack + resample + normalize in ONE jit — program count is a
  first-order cost on the remote-compile relay, CLAUDE.md);
- the ROI bounding box is reduced ON DEVICE to 7 int32s (``_roi_bounds``)
  instead of reading the whole coarse mask back over the slow D2H link;
- the fine mask returns as a bit-packed deferred volume (``_post_mask``),
  with CC post-processing and ``save_prob`` f16 maps like ``segmentation``;
- ``num_devices`` shards the fine pass's patch batches over a mesh,
  multi-host runs round-robin the case list (``_process_slice``), and
  checkpoints are selectable per model (``coarse_checkpoint`` /
  ``fine_checkpoint``); ``fine_model_dir`` may be a list (fine-fold
  ensemble averaged on device, same contract checks as ``segmentation``).
"""
from __future__ import annotations

import functools as _functools
import os
import time

import jax as _jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.core.seg_infer import (
    SegModel, load_seg_model, find_cases, IMAGE_EXTS,
    _ReadAhead, _WriteBehind, _DeferredVolume, _prep_modality, _post_mask,
    _ens_add, _ens_finalize, _process_slice, _check_ensemble_contract,
    _announce_no_cases, _case_names, prep_channels,
)
from segmentation3d_tpu.io import Volume, read_image, write_image
from segmentation3d_tpu.ops.components import (
    pick_largest_connected_component, remove_small_connected_component,
)
from segmentation3d_tpu.ops.geometry import Frame, resampled_frame
from segmentation3d_tpu.ops.mask_pack import unpack_mask
from segmentation3d_tpu.ops.resample import resample_plan, resample_exec
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer


@_functools.partial(_jax.jit, static_argnames=("kind", "out_shape"))
def _post_prob_roi(prob, coeffs, *, kind, out_shape):
    """Resample fine-ROI class probabilities to the native grid with
    BACKGROUND = 1 outside the ROI: class 0 resamples as (p0 - 1) with
    fill 0 and adds the 1 back, so out-of-ROI voxels read [1, 0, ...]
    (a valid distribution, consistent with the empty-ROI branch) instead
    of all-zeros. ROI-boundary voxels blend toward background — the same
    blend the mask's NN paste approximates."""
    shifted = prob.at[..., 0].add(-1.0)
    out = resample_exec(shifted, kind, coeffs, out_shape,
                        out_dtype=jnp.float16)
    return out.at[..., 0].add(jnp.asarray(1.0, jnp.float16))


@_jax.jit
def _roi_bounds(mask):
    """Foreground bounding box of a label map, reduced ON DEVICE to seven
    int32s ``[found, zlo, zhi, ylo, yhi, xlo, xhi]`` (inclusive).

    The alternative — reading the whole coarse mask back to find its bbox on
    host — moves megabytes over the relay's slow D2H direction (measured
    3-20 MB/s, CLAUDE.md) per case; this reads 28 bytes."""
    fg = mask > 0

    def lohi(present):
        n = present.shape[0]
        lo = jnp.argmax(present)
        hi = n - 1 - jnp.argmax(present[::-1])
        return lo, hi

    zlo, zhi = lohi(jnp.any(fg, axis=(1, 2)))
    ylo, yhi = lohi(jnp.any(fg, axis=(0, 2)))
    xlo, xhi = lohi(jnp.any(fg, axis=(0, 1)))
    found = jnp.any(fg).astype(jnp.int32)
    return jnp.stack([found, zlo, zhi, ylo, yhi, xlo, xhi]).astype(jnp.int32)


def _roi_world(lo_idx_xyz, hi_idx_xyz, frame: Frame, margin_mm: float):
    """World-space box of an index-space bbox + margin: min/max over the 8
    transformed corners (direction matrices permute/flip axes, so per-axis
    min/max must happen in world space)."""
    corners = []
    for ix in (lo_idx_xyz[0], hi_idx_xyz[0]):
        for iy in (lo_idx_xyz[1], hi_idx_xyz[1]):
            for iz in (lo_idx_xyz[2], hi_idx_xyz[2]):
                corners.append(frame.index_to_world([ix, iy, iz]))
    corners = np.asarray(corners)
    return corners.min(axis=0) - margin_mm, corners.max(axis=0) + margin_mm


def roi_from_mask(mask_zyx: np.ndarray, frame: Frame, margin_mm: float = 16.0):
    """World-space bounding box (lo_xyz, hi_xyz) of mask foreground + margin.
    Returns None if the mask is empty. (Host-side twin of ``_roi_bounds``,
    kept for library users with masks already on host.)"""
    nz = np.nonzero(mask_zyx > 0)
    if nz[0].size == 0:
        return None
    lo_idx = np.array([nz[2].min(), nz[1].min(), nz[0].min()], np.float64)
    hi_idx = np.array([nz[2].max(), nz[1].max(), nz[0].max()], np.float64)
    return _roi_world(lo_idx, hi_idx, frame, margin_mm)


def _fine_grid_for_roi(lo_xyz, hi_xyz, native: Volume, spacing, max_stride,
                       bucket: int = 1):
    """Fine-pass frame/size covering the ROI (clipped to the native volume),
    dims padded to x max(max_stride, bucket). Returns (frame, size_xyz,
    raw_size_xyz) where raw_size is the unpadded ROI extent (for adaptive
    normalizer stats). Bucketing bounds the compiled-program count: ROI
    sizes vary per case, and every distinct fine-grid shape is a distinct
    program on the remote-compile relay.

    Direction-safe (round-4 fix): the grid is CENTER-anchored — origin =
    box_center - D @ (spacing * (size-1)/2) — so it covers the world box
    for ANY direction matrix. The launch version used the world-min corner
    as origin with the native direction, which pointed the grid AWAY from
    the ROI for the diag(-1,-1,1) direction every RAS-sform NIfTI gets
    after LPS conversion. The native clip likewise uses the full 8-corner
    AABB (2 corners under-cover permuted/oblique directions), and sizes
    come from the box extent projected onto each grid axis."""
    n = np.asarray(native.size_xyz, np.float64)
    corners = np.asarray([native.frame.index_to_world([ix, iy, iz])
                          for ix in (0.0, n[0] - 1.0)
                          for iy in (0.0, n[1] - 1.0)
                          for iz in (0.0, n[2] - 1.0)])
    lo = np.maximum(corners.min(axis=0), lo_xyz)
    hi = np.maximum(np.minimum(corners.max(axis=0), hi_xyz), lo)
    spacing = np.asarray(spacing, np.float64)
    D = np.asarray(native.frame.direction, np.float64)
    ext = np.abs(D).T @ (hi - lo)          # box extent along each grid axis
    raw = np.maximum(np.ceil(ext / spacing).astype(np.int64), 1)
    mult = max(int(max_stride), int(bucket or 0))
    size = (np.ceil(raw / mult) * mult).astype(np.int64)
    origin = (lo + hi) / 2.0 - D @ (spacing * (size - 1) / 2.0)
    return Frame(origin, spacing, D), size, raw


def segment_case_coarse_to_fine(
        coarse: SegModel, fines, image_paths,
        coarse_inferer_cache: dict, fine_inferers,
        patch_size_zyx, stride_zyx=None, margin_mm: float = 16.0,
        fill_value: float = 0.0, shape_bucket: int = 32,
        vols=None, dev_data=None, defer_host=False, save_prob=False,
        post_processing=None):
    """Two-pass segmentation of one case -> (mask Volume, prob list or
    None, native Volume, seconds, roi).

    ``fines``/``fine_inferers``: the fine model(s) and matching inferer(s)
    (length > 1 = a fine-fold ensemble averaged on device). With
    ``defer_host=True`` the mask (and prob maps) return as
    :class:`~segmentation3d_tpu.core.seg_infer._DeferredVolume` — the
    packed D2H readback + CC post-processing run in the write-behind
    thread, overlapping the next case's device compute."""
    t0 = time.time()
    if vols is None:
        vols = [read_image(p) for p in image_paths]
    native = vols[0]
    assert len(vols) == coarse.in_channels, (
        f"model expects {coarse.in_channels} modalities, got {len(vols)}")
    fine = fines[0]

    # ---- pass 1: coarse whole-volume on its padded iso grid ---------------
    pad_mult = max(coarse.max_stride, int(shape_bucket or 0))
    _, c_valid = resampled_frame(native.frame, native.size_xyz,
                                 coarse.spacing, 1)
    c_frame, c_size = resampled_frame(native.frame, native.size_xyz,
                                      coarse.spacing, pad_mult)
    cvol = prep_channels(coarse, vols, dev_data, c_frame, c_size,
                         c_valid, fill_value)
    ckey = cvol.shape[:3]
    if ckey not in coarse_inferer_cache:
        coarse_inferer_cache[ckey] = SlidingWindowInferer(
            coarse.net, ckey, coarse.out_channels, batch_size=1,
            blend="constant", apply_fn=getattr(coarse, "fused_apply", None),
            apply_vars=getattr(coarse, "fused_vars", None))
    coarse_seg = coarse_inferer_cache[ckey](coarse.variables, cvol)

    # ROI bbox reduced on device; 7 int32s cross the link, not the mask
    b = np.asarray(_roi_bounds(coarse_seg))
    if not b[0]:
        empty = np.zeros(native.data.shape[:3], np.uint8)
        prob_out = None
        if save_prob:
            prob_out = []
            for c in range(fine.out_channels):
                pm = np.full(native.data.shape[:3], 1.0 if c == 0 else 0.0,
                             np.float32)
                prob_out.append((c, _DeferredVolume(native.frame,
                                                    (lambda a=pm: a))
                                 if defer_host else pm))
        mask_vol = _DeferredVolume(native.frame, lambda: empty) \
            if defer_host else Volume(empty, native.frame)
        return mask_vol, prob_out, native, time.time() - t0, None

    lo_idx = np.array([b[5], b[3], b[1]], np.float64)
    hi_idx = np.array([b[6], b[4], b[2]], np.float64)
    roi = _roi_world(lo_idx, hi_idx, c_frame, margin_mm)

    # ---- pass 2: fine sliding-window inside the ROI -----------------------
    f_frame, f_size, f_raw = _fine_grid_for_roi(
        roi[0], roi[1], native, fine.spacing, fine.max_stride,
        bucket=shape_bucket)
    # patches must fit the ROI grid (the grid extends at the HIGH end only —
    # the origin computed by _fine_grid_for_roi is unchanged)
    f_size_orig = f_size.copy()
    f_size_zyx = np.maximum(f_size[::-1], np.asarray(patch_size_zyx))
    f_size = f_size_zyx[::-1].copy()
    f_valid = np.minimum(f_raw, f_size)
    # the fine grid is CENTER-anchored: _fine_grid_for_roi splits the bucket
    # padding symmetrically around the ROI, so adaptive-normalizer stats
    # must read the centered window, not the low-index corner
    f_off = np.maximum((f_size_orig - f_valid) // 2, 0)
    fvol = prep_channels(fine, vols, dev_data, f_frame, f_size,
                         np.concatenate([f_off, f_valid]), fill_value)

    if len(fines) > 1:
        prob = fine_inferers[0](fine.variables, fvol, stride_zyx=stride_zyx,
                                return_prob=True)[1]
        for m2, inf2 in zip(fines[1:], fine_inferers[1:]):
            prob = _ens_add(prob, inf2(m2.variables, fvol,
                                       stride_zyx=stride_zyx,
                                       return_prob=True)[1])
        prob, fine_seg = _ens_finalize(prob, n=len(fines))
    else:
        fine_seg, prob = fine_inferers[0](fine.variables, fvol,
                                          stride_zyx=stride_zyx,
                                          return_prob=True)

    # ---- paste fine labels back into the native frame (device, packed) ---
    back_kind, back_coeffs, back_shape = resample_plan(
        f_frame, native.frame, native.size_xyz)
    nx = int(native.size_xyz[0])
    packed = _post_mask(fine_seg, jnp.asarray(back_coeffs), kind=back_kind,
                        out_shape=back_shape, num_classes=fine.out_channels)

    def to_mask():
        m = unpack_mask(np.asarray(packed), nx, fine.out_channels)
        if post_processing:
            kind = post_processing.get("type")
            if kind == "largest_cc":
                m = pick_largest_connected_component(m)
            elif kind == "remove_small_cc":
                m = remove_small_connected_component(
                    m, int(post_processing.get("threshold", 64)))
        return m

    prob_out = None
    if save_prob:
        # exact inside the ROI (where the fine model ran); outside, class 0
        # reads 1.0 and foreground classes 0.0 (see _post_prob_roi)
        prob_native = _post_prob_roi(prob, jnp.asarray(back_coeffs),
                                     kind=back_kind, out_shape=back_shape)
        host_cache = {}

        def prob_host():
            if "a" not in host_cache:
                host_cache["a"] = np.asarray(prob_native)
            return host_cache["a"]

        def chan(c):
            return lambda: prob_host()[..., c].astype(np.float32)

        prob_out = []
        for c in range(fine.out_channels):
            if defer_host:
                prob_out.append((c, _DeferredVolume(native.frame, chan(c))))
            else:
                prob_out.append((c, chan(c)()))

    if defer_host:
        mask_vol = _DeferredVolume(native.frame, to_mask)
    else:
        mask_vol = Volume(to_mask(), native.frame)
    return mask_vol, prob_out, native, time.time() - t0, roi


_C2F_SESSIONS: dict = {}


def _build_c2f_session(coarse_model_dir, fine_model_dirs, dtype, patch,
                       stride, batch_size, quant=None, act_clip=8.0,
                       calib_paths=None, tta=(), blend="gaussian",
                       mesh=None, coarse_checkpoint=None,
                       fine_checkpoint=None):
    """Load both models, attach fused forwards, build the fine inferer(s).

    ``quant="int8"`` quantizes the FINE models' packed forwards (the fine
    pass dominates the two-pass time); the coarse pass keeps full
    precision (its whole-volume widths are only known per case, so it uses
    the window forward, which has no quantized form). ``calib_paths``
    calibrates each fine model's activation scales on a representative image
    (one per modality), exactly like ``seg_infer --int8_calib``.
    Misconfiguration raises — never a silent full-precision run."""
    coarse = load_seg_model(coarse_model_dir, dtype=dtype,
                            checkpoint=coarse_checkpoint)
    fines = [load_seg_model(d, dtype=dtype, checkpoint=fine_checkpoint)
             for d in fine_model_dirs]
    _check_ensemble_contract(fines, fine_model_dirs)
    calibs = [None] * len(fines)
    if calib_paths is not None:
        if quant is None:
            raise ValueError("calib_image only applies with quant")
        from segmentation3d_tpu.core.seg_infer import _calibrate_for_model
        calibs = [_calibrate_for_model(f, list(calib_paths), dtype)
                  for f in fines]

    def attach_fused(model, patch_w, q=None, calib=None):
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

    # reference SIZE-partition semantics (seg_infer._case_loop): the patch
    # rounds UP to the fine model's stride instead of failing every case
    # deep in the net; an equal stride (constant blend) follows the patch
    ms = int(fines[0].max_stride)
    patch_eff = tuple(int(-(-p // ms) * ms) for p in patch)
    stride_eff = patch_eff if stride == patch else tuple(
        min(s, p) for s, p in zip(stride, patch_eff))
    for f, c in zip(fines, calibs):
        attach_fused(f, patch_eff[2], q=quant, calib=c)
    # coarse pass volumes are whole downsampled volumes bucketed to the
    # model stride; width divisibility is only known per case, so use the
    # window-conv fused forward (always valid)
    attach_fused(coarse, 1)
    # tta applies to the FINE pass only: the coarse pass exists to find the
    # ROI, where mirror averaging buys nothing the margin doesn't already
    fine_inferers = [SlidingWindowInferer(
        f.net, patch_eff, f.out_channels, batch_size=batch_size,
        blend=blend if stride_eff != patch_eff else "constant",
        apply_fn=getattr(f, "fused_apply", None),
        apply_vars=getattr(f, "fused_vars", None), tta=tta, mesh=mesh)
        for f in fines]
    return {"coarse": coarse, "fine": fines[0], "fines": fines,
            "fine_inferer": fine_inferers[0], "fine_inferers": fine_inferers,
            "coarse_cache": {}, "patch": patch_eff, "stride": stride_eff}


def segmentation_coarse_to_fine(
        input_path, coarse_model_dir, fine_model_dir, output_dir,
        seg_name="seg.mha", partition_size=(96, 96, 96),
        partition_stride=None, batch_size=8, margin_mm=16.0,
        dtype=jnp.float32, save_image=False, save_prob=False,
        post_processing=None, quant=None, act_clip=8.0,
        calib_image=None, tta=None, blend="gaussian", num_devices=1,
        shape_bucket=32, coarse_checkpoint=None, fine_checkpoint=None,
        prepared=None):
    """Batch driver mirroring ``core.seg_infer.segmentation`` for the
    two-pass pipeline — same host machinery (two-stage read-ahead /
    write-behind, per-case failure isolation, multi-host case slicing) and
    the same feature surface:

    ``save_prob`` writes per-class f16-readback probability maps (exact
    inside the ROI; fill outside); ``post_processing`` applies the same CC
    cleanup dict as ``segmentation``; ``num_devices`` shards the FINE
    pass's patch batches over a data mesh; ``coarse_checkpoint`` /
    ``fine_checkpoint`` select each model's checkpoint ('latest'/'best'/
    epoch); ``fine_model_dir`` may be a list of fine-fold directories whose
    probabilities are averaged on device (coarse stays single — it only
    finds the ROI). ``calib_image`` calibrates the quantized fine model(s)
    like ``seg_infer --int8_calib``; ``tta`` mirror-averages the fine pass.
    """
    from segmentation3d_tpu.core.infer_engine import tta_axes
    import jax
    tta = tta_axes(tta)
    mesh = None
    if num_devices is not None and (num_devices > 1 or num_devices < 0):
        from segmentation3d_tpu.parallel import make_mesh
        local = jax.local_devices() if jax.process_count() > 1 else None
        m = make_mesh(num_devices, devices=local)
        if m.devices.size > 1:
            mesh = m

    patch = tuple(int(v) for v in np.asarray(partition_size)[::-1])
    stride = tuple(int(v) for v in np.asarray(partition_stride)[::-1]) \
        if partition_stride is not None else patch

    fine_dirs = [fine_model_dir] if isinstance(
        fine_model_dir, (str, os.PathLike)) else [str(d) for d in fine_model_dir]
    if not fine_dirs:
        raise ValueError("fine_model_dir must name at least one model")
    calib_paths = None
    if calib_image is not None:
        calib_paths = tuple(calib_image) if isinstance(
            calib_image, (list, tuple)) else (calib_image,)
        if quant is None:
            raise ValueError("calib_image only applies with quant")

    # session reuse across calls (same rationale as seg_infer._SESSIONS:
    # re-created inferers force a full retrace+recompile per call); keyed by
    # checkpoint identity + every option that shapes the compiled programs
    def _ck(d, which):
        c = model_io.resolve_checkpoint(d, which)
        return (c, os.path.getmtime(os.path.join(c, "params.pth")))
    skey = (_ck(coarse_model_dir, coarse_checkpoint),
            tuple(_ck(d, fine_checkpoint) for d in fine_dirs),
            jnp.dtype(dtype).name, patch, stride, int(batch_size),
            quant, float(act_clip), calib_paths, tta, blend,
            tuple(np.asarray(mesh.devices).reshape(-1).tolist())
            if mesh is not None else None)
    sess = _C2F_SESSIONS.get(skey)
    if sess is None:
        while len(_C2F_SESSIONS) >= 2:
            _C2F_SESSIONS.pop(next(iter(_C2F_SESSIONS)))
        sess = _build_c2f_session(
            coarse_model_dir, fine_dirs, dtype, patch, stride, batch_size,
            quant=quant, act_clip=act_clip, calib_paths=calib_paths, tta=tta,
            blend=blend, mesh=mesh, coarse_checkpoint=coarse_checkpoint,
            fine_checkpoint=fine_checkpoint)
        _C2F_SESSIONS[skey] = sess
    coarse = sess["coarse"]
    fines, fine_inferers = sess["fines"], sess["fine_inferers"]
    coarse_cache = sess["coarse_cache"]
    # the session may have rounded the patch up to the fine model's stride
    patch, stride = sess["patch"], sess["stride"]

    # names disambiguate over the GLOBAL list before the round-robin slice
    # (colliding names on different processes must not share an output dir);
    # ``prepared`` (seg_infer.prepare_cases) carries an already-running
    # read-ahead so a server can overlap this request's host reads with the
    # previous request's device compute (round-5)
    from segmentation3d_tpu.core.seg_infer import PreparedInput
    if prepared is None:
        prepared = PreparedInput(input_path)
    elif prepared.input_path != input_path:
        raise ValueError(f"prepared input is for {prepared.input_path!r}, "
                         f"not {input_path!r}")
    cases, names, reader = prepared.cases, prepared.names, prepared.reader
    os.makedirs(output_dir, exist_ok=True)
    if not cases:
        _announce_no_cases(prepared.n_global, input_path)
        return []

    results = []
    failures = []
    writer = _WriteBehind()
    try:
        for (image_paths, vols, devs, read_err), name in zip(reader, names):
            if read_err is not None:
                print(f"ERROR: skipping {name}: {read_err}")
                failures.append((name, read_err))
                continue
            try:
                mask_vol, prob_out, native, secs, roi = \
                    segment_case_coarse_to_fine(
                        coarse, fines, image_paths, coarse_cache,
                        fine_inferers, patch, stride, margin_mm,
                        shape_bucket=shape_bucket, vols=vols, dev_data=devs,
                        defer_host=True, save_prob=save_prob,
                        post_processing=post_processing)
                case_dir = os.path.join(output_dir, name)
                jobs = [(mask_vol, os.path.join(case_dir, seg_name))]
                if save_image:
                    jobs.append((native, os.path.join(case_dir, "org.mha")))
                if prob_out:
                    jobs.extend((p if isinstance(p, _DeferredVolume)
                                 else Volume(p, native.frame),
                                 os.path.join(case_dir, f"prob_{c}.mha"))
                                for c, p in prob_out)
                writer.submit(name, jobs)
            except Exception as e:  # one bad case must not abort the batch
                print(f"ERROR: coarse-to-fine segmentation of {name} "
                      f"failed: {e}")
                failures.append((name, e))
                continue
            print(f"coarse-to-fine segmentation of {name}: {secs:.2f} s "
                  f"(roi={'found' if roi is not None else 'empty'})")
            results.append((name, secs))
    finally:
        # drain pending deferred writes even on an aborted loop
        for name, e in writer.close():
            print(f"ERROR: writing results of {name} failed: {e}")
            failures.append((name, e))
            results[:] = [r for r in results if r[0] != name]
    if failures and not results:
        raise failures[0][1]  # everything failed: not a per-case hiccup
    return results
