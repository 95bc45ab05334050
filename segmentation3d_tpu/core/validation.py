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

Round-4 (VERDICT round-3 weak #2): validation now uses the REAL inference
engine configuration instead of a plain whole-volume f32 forward:

- cases whose padded iso volume exceeds ``size_cap``^3 voxels fall back to
  SLAB partitioning (full-XY slabs, z overlap) instead of compiling a
  whole-volume program that must hold the entire activation set in HBM;
- under bf16 on TPU the forward routes through the fused packed/window
  builders (``models.packed_vnet`` / ``models.fused_vnet``) — the SAME
  fast path ``seg_infer`` runs. The folded parameter arrays are rebuilt
  from the live params at every save point and RE-STAGED into the cached
  inferers (fused params flow through the jit's ``variables`` argument, so
  new weights never recompile the program).

Round-5 (VERDICT round-4 weak #1): scoring moved ON DEVICE. Per-class Dice
is a reduction, so each case reads back ``2*(num_classes-1)`` floats
(``SlidingWindowInferer.dice``) instead of a full int mask over the slow
D2H relay direction (~131 MB at 320^3 — BASELINE.md measured 34.8 s/save
point for ONE case, dominated by that readback), and preprocessing routes
through the same fused per-modality program the inference drivers share
(``core.seg_infer.prep_channels``: resample + normalize in ONE jit each)
instead of eager resample/normalize dispatches.
"""
from __future__ import annotations

import types

import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.io import read_image
from segmentation3d_tpu.ops.geometry import resampled_frame
from segmentation3d_tpu.ops.resample import resample_plan, NN


def _fused_supported(net, use_fused):
    """The fused builders exist for the real SegmentationNet family under
    bf16 on an accelerator backend (the same gate as seg_infer's default)."""
    if use_fused is not None:
        return bool(use_fused)
    import jax
    return (getattr(net, "dtype", None) == jnp.bfloat16
            and hasattr(net, "base_channels")
            and jax.default_backend() != "cpu")


def _fused_builder(net, variables, patch, num_classes, state, version):
    """(bkey, apply_fn, staged_vars) for a patch shape, from the run-lifetime
    builder cache in ``state``. Folded vars are rebuilt when ``version``
    (the save-point counter) moved; the apply_fn object — which keys the jit
    cache — is built ONCE per route, so later save points reuse the compiled
    programs with fresh weights."""
    import jax
    from segmentation3d_tpu.models.packed_vnet import _p_for
    try:
        p0 = _p_for(net.base_channels)
        packed_ok = patch[2] % p0 == 0
    except Exception:
        packed_ok = False
    if packed_ok:
        from segmentation3d_tpu.ops.packed_conv import head_p_for
        ph = head_p_for(patch[2], num_classes)
        bkey = ("packed", ph)
    else:
        bkey = ("window",)

    def build():
        if bkey[0] == "packed":
            from segmentation3d_tpu.models.packed_vnet import build_packed_forward
            return build_packed_forward(net, variables, dtype=net.dtype,
                                        head_p=bkey[1])
        from segmentation3d_tpu.models.fused_vnet import build_fused_forward
        return build_fused_forward(net, variables, dtype=net.dtype)

    b = state.get(bkey)
    if b is None:
        # only the FIRST build may fail gracefully (architecture without a
        # fused form -> permanent plain-net fallback for this route)
        try:
            apply_fn, fvars = build()
            b = {"apply_fn": apply_fn,
                 "tree": jax.tree_util.tree_structure(fvars),
                 "vars": jax.device_put(fvars), "version": version}
        except (NotImplementedError, KeyError, AssertionError):
            b = {"apply_fn": None, "tree": None, "vars": None,
                 "version": version}
        state[bkey] = b
    elif b["apply_fn"] is not None and b["version"] != version:
        # new save point: re-fold the live params, keep the traced apply_fn
        # (same compiled program). A failure HERE is not a capability gap —
        # the same build succeeded before — so it propagates rather than
        # silently scoring the previous save point's weights.
        _, fvars = build()
        if jax.tree_util.tree_structure(fvars) != b["tree"]:
            b["apply_fn"] = build()[0]
            b["tree"] = jax.tree_util.tree_structure(fvars)
        b["vars"] = jax.device_put(fvars)
        b["version"] = version
    return bkey, b["apply_fn"], b["vars"]


def validate_cases(net, variables, val_list, *, spacing, interpolation,
                   normalizers, num_classes, max_stride, shape_bucket=32,
                   inferer_cache=None, size_cap=256, slab_z=64,
                   slab_overlap=16, use_fused=None, case_cache_gb=2.0):
    """Run whole-volume inference on every case of ``val_list`` (train-format
    txt) and return ``(mean_dice, per_class_dice, n_cases)``.

    ``per_class_dice[c-1]`` is the mean Dice of class ``c`` over the cases;
    ``mean_dice`` averages the foreground classes (matching the round-2
    foreground-only number when ``num_classes == 2``).

    ``inferer_cache``: dict reused across calls so same-bucket cases share
    one compiled program (pass a fresh dict to opt out). ``size_cap``:
    padded iso volumes above ``size_cap``^3 voxels run SLAB-partitioned
    (``slab_z``-plane full-XY slabs, ``slab_overlap`` z overlap) instead of
    as one whole-volume patch.

    Scoring happens ON DEVICE (``SlidingWindowInferer.dice``): only
    ``2*(num_classes-1)`` floats per case cross the D2H link, and the
    valid-region bound rides in as a traced argument so per-case valid
    sizes share one program per shape bucket.

    ``case_cache_gb``: the validation set is FIXED for the whole run and
    its preprocessing is parameter-independent, so the preprocessed iso
    device volumes (+ gt) are kept HBM-resident across save points up to
    this budget — a warm save point then costs ~the device forward only
    (the round-5 TPU measurement: 34.8 s -> 11.7 s from on-device scoring
    alone, the 11.7 s dominated by re-reading + re-uploading the same
    volumes; cached, it drops to the forward's ~2-4 s)."""
    from segmentation3d_tpu.core.seg_infer import prep_channels, _prep_modality
    from segmentation3d_tpu.dataloader.dataset import read_train_txt
    if inferer_cache is None:
        inferer_cache = {}
    fused = _fused_supported(net, use_fused)
    fstate = None
    version = 0
    if fused:
        fstate = inferer_cache.setdefault("__fused__", {"version": 0})
        fstate["version"] = version = fstate["version"] + 1
    pad_mult = max(int(max_stride), int(shape_bucket or 0))
    norms = list(normalizers) if normalizers is not None else None
    ims, sgs = read_train_txt(val_list)
    case_cache = inferer_cache.setdefault(
        "__cases__", {"budget": float(case_cache_gb) * 1e9})
    per_case = []
    for img_paths, seg_path in zip(ims, sgs):
        ckey = (tuple(img_paths), seg_path)
        cached = case_cache.get(ckey)
        if cached is not None:
            vol, gt, valid, patch, stride = cached
        else:
            vols = [read_image(p) for p in img_paths]
            v0 = vols[0]
            # all modalities co-registered onto modality-0's iso grid, like
            # the inference path (core/seg_infer.py)
            _, valid = resampled_frame(v0.frame, v0.size_xyz, spacing, 1)
            iso_frame, iso_size = resampled_frame(
                v0.frame, v0.size_xyz, spacing, pad_mult)
            shim = types.SimpleNamespace(
                normalizers=norms if norms is not None
                else [None] * len(vols), interpolation=interpolation)
            # fused per-modality preprocess (resample + normalize, ONE
            # program each) — the same path the inference drivers run
            vol = prep_channels(shim, vols, None, iso_frame, iso_size,
                                valid, 0.0)
            sv = read_image(seg_path)
            kind, coeffs, out_shape = resample_plan(sv.frame, iso_frame,
                                                    iso_size)
            gt = _prep_modality(jnp.asarray(sv.data), jnp.asarray(coeffs),
                                jnp.asarray(0.0, jnp.float32), kind=kind,
                                out_shape=out_shape, interp=NN, fill=0.0,
                                norm_spec=None, valid_zyx=None)
            D, H, W = (int(s) for s in iso_size[::-1])
            if D * H * W > int(size_cap) ** 3:
                # SLAB fallback: bound HBM to one slab's activations; same
                # engine mode the flat driver's large-volume path uses
                pz = min(int(slab_z), D)
                sz = max(pz - int(slab_overlap), 1)
                patch, stride = (pz, H, W), (sz, H, W)
            else:
                patch = stride = (D, H, W)
            nbytes = vol.size * vol.dtype.itemsize + gt.size * gt.dtype.itemsize
            if case_cache["budget"] >= nbytes:
                case_cache["budget"] -= nbytes
                case_cache[ckey] = (vol, gt, valid, patch, stride)
        key = (patch, stride)
        rec = inferer_cache.get(key)
        apply_fn = apply_vars = None
        bkey = None
        if fused:
            bkey, apply_fn, apply_vars = _fused_builder(
                net, variables, patch, num_classes, fstate, version)
        if rec is None:
            rec = {"inferer": SlidingWindowInferer(
                net, patch, num_classes, batch_size=1,
                blend="constant" if patch == stride else "gaussian",
                apply_fn=apply_fn, apply_vars=apply_vars), "bkey": bkey}
            inferer_cache[key] = rec
        elif rec["bkey"] is not None and apply_vars is not None:
            rec["inferer"].apply_vars = apply_vars  # fresh fold, same program
        # score only the VALID (unpadded) region: the model may predict
        # foreground in bucket-padding fill voxels, which would deflate the
        # Dice that drives cfg.train.save_best checkpoint selection
        valid_zyx = (int(valid[2]), int(valid[1]), int(valid[0]))
        dices = rec["inferer"].dice(variables, vol, gt, valid_zyx,
                                    stride_zyx=stride)
        per_case.append([float(d) for d in dices])
    if not per_case:
        return 0.0, [], 0
    per_class = np.mean(np.asarray(per_case, np.float64), axis=0)
    return float(per_class.mean()), [float(d) for d in per_class], len(per_case)
