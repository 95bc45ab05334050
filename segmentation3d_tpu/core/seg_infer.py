"""Inference entry — case discovery, model loading, per-case pipeline.

Re-implements ``segmentation3d/core/seg_infer.py`` (call stack SURVEY.md
§3.2): ``read_test_txt``/``read_test_csv``/folder scan (≈L20-70),
``load_seg_model`` (≈L80-140, latest-``chk_*`` scan + self-describing
checkpoint restore), and ``segmentation`` (≈L270-340): per case

    read -> resample to model spacing (padded to x max_stride) -> normalize
    -> sliding-window forward+blend (device) -> argmax -> NN-resample the
    mask back to the native frame -> optional connected-component cleanup
    -> write seg.mha / .nii.gz (+ optional prob maps, input copy)

with per-case wall-time prints. The per-patch device loop lives in
:mod:`segmentation3d_tpu.core.infer_engine`.
"""
from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
from segmentation3d_tpu.io import Volume, read_image, write_image
from segmentation3d_tpu.models import get_network_module
from segmentation3d_tpu.ops.components import (
    pick_largest_connected_component, remove_small_connected_component,
)
from segmentation3d_tpu.ops.resample import (
    resample_spacing, resample_to_frame, resample_plan, resample_exec, NN)
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.normalizer import normalizer_from_dict

IMAGE_EXTS = (".nii.gz", ".nii", ".mha", ".mhd", ".nrrd", ".nhdr", ".hdr")

DISABLE, SIZE, NUM, SLAB = "DISABLE", "SIZE", "NUM", "SLAB"


def read_test_txt(path):
    """txt: line0 = case count, then per case one or more image paths."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    num_cases = int(lines[0])
    body = lines[1:]
    if num_cases <= 0 or len(body) % num_cases != 0:
        raise ValueError(
            f"{path}: {len(body)} path line(s) do not divide into the "
            f"declared {num_cases} case(s) — a silent mis-grouping would "
            "run inference on mismatched modality files")
    per_case = len(body) // num_cases
    return [body[i * per_case:(i + 1) * per_case] for i in range(num_cases)]


def read_test_csv(path):
    import csv as _csv
    cases = []
    with open(path, newline="") as f:
        reader = _csv.reader(f)
        next(reader)  # header
        for row in reader:
            row = [c.strip() for c in row if c.strip()]
            if row:
                cases.append(row)
    return cases


def find_cases(input_path):
    """Dispatch single image / .txt list / .csv / folder like the reference
    CLI. A folder of volume files is one case per file; a folder containing
    ``.dcm`` slices is ONE DICOM-series case (``io.dicom``); otherwise
    subfolders that contain ``.dcm`` slices are each a series case."""
    if os.path.isdir(input_path):
        names = sorted(os.listdir(input_path))
        files = [os.path.join(input_path, f) for f in names
                 if f.lower().endswith(IMAGE_EXTS)]
        if files:
            return [[f] for f in files]
        if any(n.lower().endswith(".dcm") for n in names):
            return [[input_path]]  # the folder IS one DICOM series
        series = [os.path.join(input_path, n) for n in names
                  if os.path.isdir(os.path.join(input_path, n))
                  and any(m.lower().endswith(".dcm")
                          for m in os.listdir(os.path.join(input_path, n)))]
        return [[s] for s in series]
    if input_path.endswith(".txt"):
        return read_test_txt(input_path)
    if input_path.endswith(".csv"):
        return read_test_csv(input_path)
    return [[input_path]]


def _strip_ext(name):
    for suf in IMAGE_EXTS:
        if name.endswith(suf):
            return name[: -len(suf)]
    return name


def _case_names(cases):
    """One output-directory name per case, UNIQUE across the batch: the
    extension-stripped basename, disambiguated by the parent directory when
    several cases share a filename (the common per-case-folder layout —
    every case named ``image.nii.gz`` must not overwrite one output dir),
    and by a numeric suffix as a last resort."""
    base = [_strip_ext(os.path.basename(c[0])) for c in cases]
    names = list(base)
    from collections import Counter
    dup = {n for n, k in Counter(names).items() if k > 1}
    if dup:
        names = [os.path.join(os.path.basename(os.path.dirname(c[0])), n)
                 if n in dup and os.path.basename(os.path.dirname(c[0]))
                 else n for n, c in zip(names, cases)]
    seen = Counter()
    out = []
    for n in names:
        seen[n] += 1
        out.append(n if seen[n] == 1 else f"{n}_{seen[n]}")
    return out


class SegModel:
    """A loaded, inference-ready model (net + variables + preprocessing spec)."""

    def __init__(self, net, variables, spacing, max_stride, interpolation,
                 normalizers, in_channels, out_channels, net_name, epoch_idx):
        self.net = net
        self.variables = variables
        self.spacing = spacing
        self.max_stride = max_stride
        self.interpolation = interpolation
        self.normalizers = normalizers
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.net_name = net_name
        self.epoch_idx = epoch_idx


def load_seg_model(model_dir: str, dtype=jnp.float32,
                   checkpoint=None) -> SegModel:
    """Scan ``<model_dir>/checkpoints/chk_*`` for the latest epoch and restore
    everything from the self-describing ``params.pth``.

    ``checkpoint``: ``None``/``'latest'`` (highest epoch, the reference
    behavior), ``'best'`` (the ``cfg.train.save_best`` checkpoint), or an
    epoch number.

    Checkpoints written by this framework restore by name; checkpoints
    trained with the PyTorch reference (foreign module names) fall back to
    the positional structural importer (``compat.torch_import``)."""
    chk = model_io.resolve_checkpoint(model_dir, checkpoint)
    payload = model_io.load_checkpoint_payload(chk)
    import jax
    net_mod = get_network_module(payload["net"])
    net_kwargs = payload.get("net_kwargs") or {}
    net_kwargs.pop("dtype", None)
    net = net_mod.SegmentationNet(
        in_channels=int(payload["in_channels"]),
        out_channels=int(payload["out_channels"]),
        dtype=dtype,
        **net_kwargs,
    )
    state = payload["state_dict"]
    if "_kernel_layouts" in payload:  # written by this framework
        variables = model_io.unflatten_state_dict(
            state, payload["_kernel_layouts"])
    else:  # reference-trained checkpoint: positional structural import
        from segmentation3d_tpu.compat.torch_import import import_torch_state_dict
        ms = int(payload["max_stride"])
        example = (1, ms, ms, ms, int(payload["in_channels"]))
        variables = import_torch_state_dict(state, net, example)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    normalizers = [normalizer_from_dict(d) for d in payload["crop_normalizers"]]
    return SegModel(
        net=net, variables=variables,
        spacing=[float(s) for s in payload["spacing"]],
        max_stride=int(payload["max_stride"]),
        interpolation=payload.get("interpolation", "LINEAR"),
        normalizers=normalizers,
        in_channels=int(payload["in_channels"]),
        out_channels=int(payload["out_channels"]),
        net_name=payload["net"],
        epoch_idx=int(payload.get("epoch_idx", -1)),
    )


import queue as _queue
import threading as _threading


class _ReadAhead:
    """Background case reader as a TWO-STAGE pipeline on separate threads:

      decode thread:  file read + gzip decode + bit-pack  (~1.6 s/case CPU)
      upload thread:  ``jax.device_put`` of the packed data (H2D; the relay
                      link speed is WEATHER — measured anywhere from ~15
                      MB/s to ~1.2 GB/s across sessions)

    so the decode of case N+2, the upload of case N+1 and the device compute
    of case N all overlap. With both stages on ONE thread (round 2) the
    steady state was their SUM (4.9 s/case measured for 384^3 int16
    .nii.gz); pipelined it is max(stage) (BASELINE.md round-3 e2e rows).

    Volumes are read in their STORED dtype (CT is almost always int16 on
    disk) and bit-packed to the value range's width (``ops.volume_pack``:
    int16 CT fits 12 bits -> 25% fewer bytes, 8-bit data -> 50%) so the
    transfer moves the minimum bytes. ``devs`` holds ``(device_array,
    pack_meta)`` pairs; the host numpy stays available for ``save_image``."""

    def __init__(self, cases, depth=2, to_device=True):
        self.q = _queue.Queue(maxsize=max(1, depth))
        self._uq = _queue.Queue(maxsize=1)
        self._dt = _threading.Thread(target=self._decode,
                                     args=(list(cases), to_device),
                                     daemon=True)
        self._ut = _threading.Thread(target=self._upload, daemon=True)
        self._dt.start()
        self._ut.start()

    def _decode(self, cases, to_device):
        for image_paths in cases:
            try:
                vols = [read_image(p) for p in image_paths]
                packed = None
                if to_device:
                    from segmentation3d_tpu.ops.volume_pack import pack_volume_np
                    packed = [pack_volume_np(v.data) for v in vols]
                self._uq.put((image_paths, vols, packed, None))
            except Exception as e:  # surface the error at consumption time
                self._uq.put((image_paths, None, None, e))
        self._uq.put(None)

    def _upload(self):
        import jax
        while True:
            item = self._uq.get()
            if item is None:
                self.q.put(None)
                return
            image_paths, vols, packed, err = item
            devs = None
            if err is None and packed is not None:
                try:
                    devs = [(jax.device_put(p), meta) for p, meta in packed]
                except Exception as e:  # surfaced at consumption time
                    err = e
            self.q.put((image_paths, vols, devs, err))

    def __iter__(self):
        return self

    def __next__(self):
        """Yields (paths, vols, devs, read_error); one unreadable case must
        not abort the batch run (the reference's per-case loop fails at worst
        one case, SURVEY.md §3.2) — the caller decides."""
        item = self.q.get()
        if item is None:
            raise StopIteration
        return item


class _DeferredVolume:
    """A result volume whose voxels still live ON DEVICE (bit-packed mask or
    f16 prob map). ``materialize()`` performs the device->host transfer,
    unpack, and optional connected-component post-processing — called from
    the write-behind materialize thread so the slow D2H direction of the
    relay (measured 3-20 MB/s; H2D is orders of magnitude faster) overlaps
    the NEXT case's device compute instead of serializing after it."""

    def __init__(self, frame, thunk):
        self.frame = frame
        self._thunk = thunk  # () -> host np.ndarray (does its own D2H)

    def materialize(self) -> Volume:
        return Volume(self._thunk(), self.frame)


class _WriteBehind:
    """Background result writer as a TWO-STAGE pipeline (the mirror of
    :class:`_ReadAhead`):

      materialize thread:  device->host readback + bit-unpack + CC post-ops
                           (D2H is the genuinely slow relay direction —
                           measured 3-20 MB/s vs ~GB/s H2D; ~2-3 s/case)
      write thread:        gzip-compress + file write (~1.5 s/case CPU)

    so case N's file write overlaps case N+1's readback, which overlaps case
    N+2's device compute. With both stages on ONE thread the write-behind
    stage was their SUM (~4.3 s/case measured for 384^3) and capped the
    whole pipeline; split, the stage cost is max(readback, write)."""

    def __init__(self, depth=2):
        self.q = _queue.Queue(maxsize=max(1, depth))
        self._wq = _queue.Queue(maxsize=max(1, depth))
        self.failures = []
        self._mt = _threading.Thread(target=self._materialize, daemon=True)
        self._wt = _threading.Thread(target=self._write, daemon=True)
        self._mt.start()
        self._wt.start()

    def _materialize(self):
        while True:
            item = self.q.get()
            if item is None:
                self._wq.put(None)
                return
            case_name, jobs = item
            try:
                jobs = [(v.materialize() if isinstance(v, _DeferredVolume)
                         else v, path) for v, path in jobs]
            except Exception as e:  # noqa: BLE001 — surfaced at end
                self.failures.append((case_name, e))
                continue
            self._wq.put((case_name, jobs))

    def _write(self):
        while True:
            item = self._wq.get()
            if item is None:
                return
            case_name, jobs = item
            try:
                for vol, path in jobs:
                    write_image(vol, path)
            except Exception as e:  # noqa: BLE001 — collected, surfaced at end
                self.failures.append((case_name, e))

    def submit(self, case_name, jobs):
        self.q.put((case_name, jobs))

    def close(self):
        self.q.put(None)
        self._mt.join()
        self._wt.join()
        return self.failures


import functools as _functools

import jax as _jax

#: segmentation() runtime sessions (loaded model + fused builders +
#: inferers) keyed by checkpoint + engine config; bounded so a couple of
#: models (e.g. a coarse + a fine pass) stay warm without growing HBM use.
_SESSIONS: dict = {}
_SESSION_CAP = 4


@_functools.partial(_jax.jit, static_argnames=(
    "kind", "out_shape", "interp", "fill", "norm_spec", "valid_zyx",
    "pack_scheme", "src_shape"))
def _prep_modality(src, coeffs, pack_lo, *, kind, out_shape, interp, fill,
                   norm_spec, valid_zyx, pack_scheme="raw", src_shape=None):
    """ONE program for a modality's whole device-side preprocessing:
    bit-packed stored-dtype upload -> unpack (``ops.volume_pack``) -> f32
    resample onto the iso grid -> normalize.
    Fusing these (instead of eager unpack + eager resample + eager
    normalizer ops) matters
    on the remote-compile relay, where every distinct program costs seconds to
    minutes of first-call latency — program COUNT is a first-order cost.
    ``norm_spec``: hashable ``tuple(sorted(normalizer.to_dict().items()))``
    or None; ``valid_zyx``: unpadded region for adaptive stats — either
    ``(vz, vy, vx)`` (corner-anchored) or ``(oz, oy, ox, vz, vy, vx)`` with
    an explicit offset (center-anchored grids, e.g. the c2f fine grid pad
    the valid content symmetrically); None for non-adaptive specs so shared
    cases don't fork compilations."""
    if pack_scheme != "raw":
        from segmentation3d_tpu.ops.volume_pack import unpack_volume
        src = unpack_volume(src, scheme=pack_scheme, shape=src_shape,
                            lo=pack_lo)
    iso = resample_exec(src, kind, coeffs, out_shape, interp, fill,
                        out_dtype=jnp.float32)
    if norm_spec is not None:
        norm = normalizer_from_dict(dict(norm_spec))
        from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer
        if isinstance(norm, AdaptiveNormalizer):
            if len(valid_zyx) == 6:
                oz, oy, ox, vz, vy, vx = valid_zyx
            else:
                oz = oy = ox = 0
                vz, vy, vx = valid_zyx
            iso = norm(iso, stats_of=iso[oz:oz + vz, oy:oy + vy, ox:ox + vx])
        else:
            iso = norm(iso)
    return iso


@_functools.partial(_jax.jit, static_argnames=(
    "kind", "out_shape", "num_classes"))
def _post_mask(seg, coeffs, *, kind, out_shape, num_classes):
    """ONE program for mask finalization: NN-resample the iso label map back
    to the native grid and bit-pack it for the cheap device->host readback."""
    from segmentation3d_tpu.ops.mask_pack import pack_mask
    m = resample_exec(seg.astype(jnp.int32), kind, coeffs, out_shape,
                      interp=NN, fill=0.0)
    return pack_mask(m, num_classes)


@_functools.partial(_jax.jit, static_argnames=("kind", "out_shape"))
def _post_prob(prob, coeffs, *, kind, out_shape):
    """ONE program resampling ALL class probability maps back to the native
    grid, f16 for the halved readback."""
    return resample_exec(prob, kind, coeffs, out_shape,
                         out_dtype=jnp.float16)


@_jax.jit
def _ens_add(a, b):
    return a + b


@_functools.partial(_jax.jit, static_argnames=("n",))
def _ens_finalize(prob_sum, *, n):
    """Ensemble tail: mean of the member probability maps + argmax, one tiny
    program (program COUNT is a first-order cost on the remote-compile
    relay)."""
    prob = prob_sum / np.float32(n)
    return prob, jnp.argmax(prob, axis=-1).astype(jnp.uint8)


def prep_channels(model, vols, dev_data, dst_frame, dst_size, valid_xyz,
                  fill_value):
    """Stack a model's input channels on the ``dst`` grid through the fused
    preprocess program (:func:`_prep_modality`: bit-unpack + resample +
    normalize in ONE jit). Shared by the flat driver and both passes of
    coarse-to-fine; ``valid_xyz`` bounds adaptive-normalizer stats to the
    unpadded region — ``(vx, vy, vz)`` sizes (corner-anchored) or
    ``(ox, oy, oz, vx, vy, vz)`` with an explicit offset for grids that pad
    symmetrically (the c2f center-anchored fine grid)."""
    from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer
    channels = []
    for mi, v in enumerate(vols):
        if dev_data is not None:
            src, pmeta = dev_data[mi]
        else:
            src, pmeta = v.data, {"scheme": "raw", "lo": 0,
                                  "shape": tuple(v.data.shape)}
        kind, coeffs, out_shape = resample_plan(v.frame, dst_frame, dst_size)
        norm = model.normalizers[mi]
        norm_spec = tuple(sorted(norm.to_dict().items())) \
            if norm is not None else None
        # percentile window from the VALID region only — bucket padding
        # (fill voxels) must not skew the intensity statistics
        if isinstance(norm, AdaptiveNormalizer):
            vv = tuple(int(t) for t in np.asarray(valid_xyz).reshape(-1))
            if len(vv) == 6:  # (ox,oy,oz,vx,vy,vz) -> (oz,oy,ox,vz,vy,vx)
                valid_zyx = (vv[2], vv[1], vv[0], vv[5], vv[4], vv[3])
            else:
                valid_zyx = (vv[2], vv[1], vv[0])
        else:
            valid_zyx = None
        channels.append(_prep_modality(
            jnp.asarray(src), jnp.asarray(coeffs),
            jnp.asarray(pmeta["lo"], jnp.float32),
            kind=kind, out_shape=out_shape, interp=model.interpolation,
            fill=fill_value, norm_spec=norm_spec, valid_zyx=valid_zyx,
            pack_scheme=pmeta["scheme"], src_shape=tuple(pmeta["shape"])))
    return jnp.stack(channels, axis=-1)  # [D,H,W,C]


def segmentation_one_case(model: SegModel, image_paths, inferer: SlidingWindowInferer,
                          stride_zyx=None, save_prob=False, post_processing=None,
                          fill_value: float = 0.0, shape_bucket: int = 64,
                          vols=None, dev_data=None, defer_host=False,
                          extra_members=()):
    """Segment one (possibly multi-modality) case. Returns (mask Volume,
    prob arrays or None, native Volume, seconds).

    ``extra_members``: additional ensemble members as ``(SegModel, inferer)``
    pairs sharing this model's preprocessing contract (same spacing,
    interpolation, normalizers — enforced by :func:`segmentation`). Class
    probabilities are averaged over all members on device before the argmax;
    the preprocessed iso volume is built ONCE and shared.

    ``shape_bucket``: iso volumes are padded up to multiples of this (instead
    of just ``max_stride``) so cases of similar size share one compiled
    program — compile time dominates the first case per shape otherwise.

    ``dev_data``: optional per-modality DEVICE arrays (stored-dtype uploads
    issued from the read-ahead thread) used in place of ``vols[i].data``.
    ``defer_host=True`` returns the mask as a :class:`_DeferredVolume`
    (bit-packed, still on device) so the device->host readback and CC
    post-processing run in the write-behind thread.
    """
    t0 = time.time()
    if vols is None:
        vols = [read_image(p) for p in image_paths]
    native = vols[0]
    assert len(vols) == model.in_channels, (
        f"model expects {model.in_channels} modalities, got {len(vols)}")

    pad_mult = max(model.max_stride, int(shape_bucket or 0))
    # Resample modality 0 to model spacing (pad to x bucket); remaining
    # modalities are resampled ONTO THAT SAME iso grid so modalities with
    # shifted native frames stay registered in world space (each modality
    # resampled onto its own grid would silently discard the offset).
    # Per-modality work happens in the fused preprocess program with
    # bit-packed stored-dtype uploads (prep_channels).
    from segmentation3d_tpu.ops.geometry import resampled_frame
    # valid (unpadded) region of the shared iso grid, for adaptive stats
    _, valid = resampled_frame(vols[0].frame, vols[0].size_xyz, model.spacing, 1)
    iso_frame, iso_size = resampled_frame(
        vols[0].frame, vols[0].size_xyz, model.spacing, pad_mult)
    vol = prep_channels(model, vols, dev_data, iso_frame, iso_size, valid,
                        fill_value)

    if extra_members:
        prob = inferer(model.variables, vol, stride_zyx=stride_zyx,
                       return_prob=True)[1]
        for m2, inf2 in extra_members:
            prob = _ens_add(prob, inf2(m2.variables, vol,
                                       stride_zyx=stride_zyx,
                                       return_prob=True)[1])
        prob, seg_iso = _ens_finalize(prob, n=1 + len(extra_members))
    else:
        seg_iso, prob = inferer(model.variables, vol, stride_zyx=stride_zyx,
                                return_prob=True)

    # resample mask back to the native input frame (NN), then bit-pack it on
    # device: the host link is the bottleneck (~20-25 MB/s measured), so a
    # binary 384^3 mask crosses as 7 MB instead of 226 MB of int32
    from segmentation3d_tpu.ops.mask_pack import unpack_mask
    back_kind, back_coeffs, back_shape = resample_plan(
        iso_frame, native.frame, native.size_xyz)
    nx = int(native.size_xyz[0])
    packed = _post_mask(seg_iso, jnp.asarray(back_coeffs), kind=back_kind,
                        out_shape=back_shape, num_classes=model.out_channels)

    def to_mask():
        m = unpack_mask(np.asarray(packed), nx, model.out_channels)
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
        # ONE program resamples all classes; f16 halves the readback, and
        # the host copy is pulled ONCE and shared by the per-class volumes.
        # On-disk maps are cast back to f32 (the compute was bf16/f32 — f16
        # adds ~1e-3 relative noise to a visualization artifact).
        prob_native = _post_prob(prob, jnp.asarray(back_coeffs),
                                 kind=back_kind, out_shape=back_shape)
        host_cache = {}

        def prob_host():
            if "a" not in host_cache:
                host_cache["a"] = np.asarray(prob_native)
            return host_cache["a"]

        def chan(c):
            return lambda: prob_host()[..., c].astype(np.float32)

        prob_out = []
        for c in range(model.out_channels):
            if defer_host:
                prob_out.append((c, _DeferredVolume(native.frame, chan(c))))
            else:
                prob_out.append((c, chan(c)()))

    if defer_host:
        mask_vol = _DeferredVolume(native.frame, to_mask)
    else:
        mask_vol = Volume(to_mask(), native.frame)
    return mask_vol, prob_out, native, time.time() - t0


def _calibrate_for_model(model: SegModel, image_paths, dtype, cap: int = 192):
    """Per-site activation maxima for the int8 build, measured on a real
    calibration image run through the SAME preprocessing as inference
    (fixed-spacing resample + per-modality normalizers). The iso volume is
    center-cropped to <= ``cap`` per dim (bounding the one full-precision
    measurement forward); ``cap`` is a multiple of every legal max_stride."""
    from segmentation3d_tpu.utils.image_tools import resample_spacing
    from segmentation3d_tpu.models.packed_vnet import calibrate_int8
    from segmentation3d_tpu.ops.packed_conv import head_p_for
    if len(image_paths) != model.in_channels:
        raise ValueError(
            f"calibration needs {model.in_channels} modality image(s), "
            f"got {len(image_paths)}")
    chans = []
    for p, norm in zip(image_paths, model.normalizers):
        iso = resample_spacing(read_image(p, dtype=np.float32), model.spacing,
                               model.max_stride, model.interpolation)
        data = iso.data
        if norm is not None:
            data = np.asarray(norm(jnp.asarray(data)), np.float32)
        chans.append(np.asarray(data, np.float32))
    x = np.stack(chans, axis=-1)
    sl = []
    for n in x.shape[:3]:
        t = min(n, cap)
        s = (n - t) // 2
        sl.append(slice(s, s + t))
    x = x[tuple(sl)]
    return calibrate_int8(
        model.net, model.variables, [jnp.asarray(x)[None]], dtype=dtype,
        head_p=head_p_for(x.shape[2], model.out_channels))


class PreparedInput:
    """An input whose case discovery and two-stage read-ahead (decode +
    stored-dtype device upload) already STARTED — built by
    :func:`prepare_cases`, consumed by :func:`segmentation` /
    ``segmentation_coarse_to_fine`` via ``prepared=``. This is how
    ``seg_serve`` overlaps the NEXT queued request's host work (file read,
    gunzip, bit-pack, H2D) with the current request's device compute
    (round-5; the reader threads are the same `_ReadAhead` machinery the
    batch drivers pipeline cases with)."""

    def __init__(self, input_path):
        self.input_path = input_path
        cases = find_cases(input_path)
        self.n_global = len(cases)
        self.names = _process_slice(_case_names(cases))
        self.cases = _process_slice(cases)
        self.reader = _ReadAhead(self.cases) if self.cases else None


def prepare_cases(input_path) -> PreparedInput:
    """Start reading ``input_path``'s cases in the background; pass the
    result as ``segmentation(..., prepared=...)``. Purely host/transfer
    work — model-independent, so it can run while another request computes."""
    return PreparedInput(input_path)


def segmentation(input_path, model_dir, output_dir, seg_name="seg.mha",
                 gpu_id=0, save_image=False, save_prob=False,
                 partition_type=DISABLE, partition_size=None, partition_stride=None,
                 batch_size=8, blend="gaussian", post_processing=None,
                 dtype=jnp.float32, fused=None, shape_bucket=64,
                 num_devices=1, spatial_shard=False, quant=None,
                 act_clip=8.0, calib_image=None, tta=None, checkpoint=None,
                 prepared=None):
    """Segment all cases found at ``input_path`` — the reference's public
    entry (``core/seg_infer.py:segmentation`` ≈L270-340).

    ``gpu_id`` is accepted for CLI parity; device selection on TPU is
    managed by JAX. ``partition_type``: DISABLE (whole volume), SIZE
    (fixed ``partition_size``/``partition_stride`` boxes), NUM.
    ``fused``: route the forward through the BN-folded Pallas path
    (default: on for bfloat16 on TPU).
    ``num_devices``: >1 or -1 (= all) splits each volume's patch batches
    over a ``data`` mesh (one psum of the blend accumulators per volume).
    ``spatial_shard``: with SLAB partitioning and a multi-device mesh,
    z-shard each VOLUME over the chips instead (halo exchange; no chip
    holds the full volume) — the >512^3 single-volume mode.
    ``quant="int8"`` (opt-in, requires the packed fused forward): every
    conv between stem and softmax runs int8 on the 2x MXU path with int8
    activations — measured 72 -> 90 volumes/min on the 512^3 headline;
    accuracy is approximate (static activation scales; see
    ``models/packed_vnet.py``) — validate per model with ``seg_eval``.
    ``calib_image``: path (or list of per-modality paths) of a
    representative image; its measured per-site activation ranges replace
    the uncalibrated ``act_clip``-sigma assumption (one full-precision
    forward at session build).
    ``tta``: test-time mirror augmentation — axis names ('x', 'zy', 'all',
    or a list) of the resampled volume to flip; probabilities are averaged
    over every flip combination (2^n forwards per patch). Beyond the
    reference (which has no TTA); opt-in.
    ``checkpoint``: which checkpoint of ``model_dir`` to run — ``None``/
    ``'latest'`` (reference behavior), ``'best'`` (the best-validation
    checkpoint written by ``cfg.train.save_best``), or an epoch number.
    Multi-host: under ``jax.process_count() > 1`` (launch with
    ``jax.distributed.initialize``, same arguments on every host) the case
    list is round-robin-sliced across processes, each running on its own
    local chips and writing into the shared ``output_dir`` — linear scaling
    for batch inference; the return value covers this process's slice.
    ``model_dir`` may be a LIST of model directories (``seg_infer -m a -m
    b``): an ensemble whose class probabilities are averaged on device
    before the argmax. Members must share the preprocessing contract
    (spacing, interpolation, normalizers, channel counts) — cross-fold
    ensembles of one config; the iso volume is preprocessed once and
    shared. Beyond the reference; opt-in.
    """
    del gpu_id
    import jax
    from segmentation3d_tpu.core.infer_engine import tta_axes
    tta = tta_axes(tta)  # normalize early: bad axis names fail every case
    mesh = None
    if num_devices is not None and (num_devices > 1 or num_devices < 0):
        from segmentation3d_tpu.parallel import make_mesh
        # multi-host: each process runs an independent engine over its OWN
        # local chips (cases are process-sliced below) — never a mesh with
        # non-addressable devices, which whole-volume device_put can't feed
        local = jax.local_devices() if jax.process_count() > 1 else None
        m = make_mesh(num_devices, devices=local)
        if m.devices.size > 1:
            mesh = m
    if fused is None:
        import jax
        fused = (dtype == jnp.bfloat16 and jax.default_backend() != "cpu")
    if quant is not None and not fused:
        raise ValueError("quant requires the fused packed forward "
                         "(pass fused=True, or bf16 dtype on TPU)")
    # Session reuse: rebuilding the model + fused builders + inferers per
    # segmentation() call re-traces and re-compiles every program (the jit
    # caches key on the inferer/apply_fn OBJECTS) — measured 19 s of pure
    # re-dispatch per call on the remote-compile relay AFTER an identical
    # call had already compiled everything in-process. Keyed by checkpoint
    # identity + every engine option that shapes the compiled programs.
    model_dirs = [model_dir] if isinstance(model_dir, (str, os.PathLike)) \
        else [str(d) for d in model_dir]
    if not model_dirs:
        raise ValueError("model_dir must name at least one model directory")
    chks = tuple(model_io.resolve_checkpoint(str(d), checkpoint)
                 for d in model_dirs)
    calib_paths = None
    if calib_image is not None:
        calib_paths = tuple(calib_image) if isinstance(
            calib_image, (list, tuple)) else (calib_image,)
        if quant is None:
            raise ValueError("calib_image only applies with quant")
    skey = (chks,
            tuple(os.path.getmtime(os.path.join(c, "params.pth"))
                  for c in chks),
            jnp.dtype(dtype).name, bool(fused), blend, int(batch_size),
            bool(spatial_shard), partition_type, quant, float(act_clip),
            calib_paths, tta,
            tuple(np.asarray(mesh.devices).reshape(-1).tolist())
            if mesh is not None else None)
    sess = _SESSIONS.get(skey)
    if sess is None:
        while len(_SESSIONS) >= _SESSION_CAP:  # droppable: caches only
            _SESSIONS.pop(next(iter(_SESSIONS)))
        ms = [load_seg_model(str(d), dtype=dtype, checkpoint=checkpoint)
              for d in model_dirs]
        _check_ensemble_contract(ms, model_dirs)
        sess = {"models": ms, "builders": {}, "inferers": {},
                "calib": [None] * len(ms)}
        if calib_paths is not None:
            sess["calib"] = [_calibrate_for_model(m, list(calib_paths), dtype)
                             for m in ms]
        _SESSIONS[skey] = sess
    models = sess["models"]
    model = models[0]
    _builders = sess["builders"]

    def fused_forward_for(patch, mi=0):
        """(apply_fn, apply_vars) for a patch shape: the packed-domain
        forward (every op in channels-minor [.., cols, P*C] form — 38.8 ->
        54.1 volumes/min/chip on the 512^3 headline) when the patch width
        allows it, else the per-site window-conv forward; (None, None) when
        fused is off or the architecture is unsupported."""
        if not fused:
            return None, None
        m = models[mi]
        from segmentation3d_tpu.models.packed_vnet import _p_for
        from segmentation3d_tpu.ops.packed_conv import head_p_for
        p0 = _p_for(m.net.base_channels)
        if patch[2] % p0 == 0:
            # head packing adapts to the patch width (W-divisible; the
            # proj kernel is numpy-prebuilt so it keys the builder cache)
            ph = head_p_for(patch[2], m.net.out_channels)
            key = (mi, "packed", ph)
        else:
            key = (mi, "window")
        if quant is not None and key[1] == "window":
            # never degrade silently: int8 requires the packed route
            raise ValueError(
                f"quant={quant!r} requires the packed-domain forward, but "
                f"patch width {patch[2]} is not divisible by its in_block "
                f"packing {p0} — choose a partition width that is, or drop "
                "the quant option")
        if key not in _builders:
            try:
                if key[1] != "window":
                    from segmentation3d_tpu.models.packed_vnet import (
                        build_packed_forward)
                    _builders[key] = build_packed_forward(
                        m.net, m.variables, dtype=dtype, head_p=ph,
                        quant=quant, act_clip=act_clip,
                        calib=sess["calib"][mi])
                else:
                    from segmentation3d_tpu.models.fused_vnet import (
                        build_fused_forward)
                    _builders[key] = build_fused_forward(
                        m.net, m.variables, dtype=dtype,
                        wide_xy=(partition_type == SLAB))
            except (NotImplementedError, KeyError, AssertionError):
                if quant is not None:
                    raise ValueError(
                        f"quant={quant!r} requires the packed-domain "
                        "forward, which this architecture does not support")
                _builders[key] = (None, None)
        return _builders[key]
    # configuration errors that would fail EVERY case are raised before any
    # result is produced (and before the write-behind thread exists)
    if spatial_shard:
        if partition_type != SLAB:
            raise ValueError("spatial_shard works with SLAB partitioning")
        if mesh is None:
            raise ValueError("spatial_shard requires num_devices > 1")
        if tta:
            raise ValueError("tta is not supported with spatial_shard")
        if len(models) > 1:
            raise ValueError("ensembles are not supported with spatial_shard")
    if partition_type not in (DISABLE, SIZE, NUM, SLAB):
        raise NotImplementedError(f"partition_type {partition_type}")

    # multi-host batch inference is embarrassingly parallel: each process
    # takes a deterministic round-robin slice of the case list, runs it on
    # its local chips, and writes into the (shared) output_dir. Launch one
    # process per host via jax.distributed.initialize, same input/output
    # args everywhere; the returned results cover THIS process's slice.
    # Output names are disambiguated over the GLOBAL list before slicing:
    # two colliding cases that land on different processes would otherwise
    # each locally see no duplicate and clobber one shared output dir.
    # ``prepared`` (a PreparedInput) carries case discovery + an already-
    # running read-ahead, so a server can overlap this request's host reads
    # with the previous request's device compute.
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

    inferers = sess["inferers"]
    results = []
    failures = []
    writer = _WriteBehind()
    try:
        _case_loop(cases, models, mesh, fused_forward_for, partition_type,
                   partition_size, partition_stride, batch_size, blend,
                   spatial_shard, shape_bucket, save_image, save_prob,
                   post_processing, output_dir, seg_name, inferers, results,
                   failures, writer, tta=tta, names=names, reader=reader)
    finally:
        # the writer is drained even when the loop is aborted (KeyboardInterrupt,
        # a config-level error): cases already reported successful must not
        # silently lose their pending deferred writes
        for case_name, e in writer.close():
            print(f"ERROR: writing results of {case_name} failed: {e}")
            failures.append((case_name, e))
            results[:] = [r for r in results if r[0] != case_name]
    if failures and not results:
        raise failures[0][1]  # everything failed: not a per-case hiccup
    return results


def _announce_no_cases(n_global, input_path):
    """Report an empty case slice: under multi-host the global list may be
    non-empty with every case assigned to OTHER processes (more hosts than
    cases) — not a data error, and not 'no cases found'."""
    if n_global:
        import jax
        print(f"note: empty case slice on process "
              f"{jax.process_index()}/{jax.process_count()} "
              f"({n_global} case(s) assigned to other processes)")
    else:
        print(f"warning: no cases found at {input_path}")


def _process_slice(cases, process_index=None, process_count=None):
    """Round-robin slice of the case list for this process (multi-host
    batch inference). Identity when single-process. Round-robin (not
    contiguous blocks) so sorted-by-size case lists balance across hosts."""
    import jax
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if pc <= 1:
        return cases
    return cases[pi::pc]


def _check_ensemble_contract(models, model_dirs):
    """Ensemble members must agree on everything that shapes preprocessing
    and the output space — the iso volume is built once and shared, and
    class probabilities are averaged elementwise."""
    def contract(m):
        return (tuple(float(s) for s in m.spacing), m.interpolation,
                int(m.max_stride), int(m.in_channels), int(m.out_channels),
                tuple(tuple(sorted(n.to_dict().items())) if n is not None
                      else None for n in m.normalizers))
    base = contract(models[0])
    for m, d in zip(models[1:], model_dirs[1:]):
        if contract(m) != base:
            raise ValueError(
                f"ensemble member {d!r} disagrees with {model_dirs[0]!r} on "
                "the preprocessing contract (spacing / interpolation / "
                "max_stride / channel counts / normalizers) — ensembles "
                "average probabilities on one shared iso grid, so members "
                "must be folds of the same configuration")


def _case_loop(cases, models, mesh, fused_forward_for, partition_type,
               partition_size, partition_stride, batch_size, blend,
               spatial_shard, shape_bucket, save_image, save_prob,
               post_processing, output_dir, seg_name, inferers, results,
               failures, writer, tta=(), names=None, reader=None):
    model = models[0]
    if names is None:  # single-process callers; multi-host passes the
        names = _case_names(cases)  # globally-disambiguated slice in
    if reader is None:
        reader = _ReadAhead(cases)
    for (image_paths, vols, devs, read_err), case_name in zip(reader, names):
        if read_err is not None:
            print(f"ERROR: skipping {case_name}: {read_err}")
            failures.append((case_name, read_err))
            continue

        pad_mult = max(model.max_stride, int(shape_bucket or 0))
        v0 = vols[0]
        try:
            from segmentation3d_tpu.ops.geometry import resampled_frame
            _, iso_size = resampled_frame(
                v0.frame, v0.size_xyz, model.spacing, pad_mult)
            if partition_type == DISABLE:
                # whole padded volume as a single patch
                patch = tuple(int(s) for s in iso_size[::-1])
                stride = patch
            elif partition_type == SIZE:
                # reference semantics: every volume is resampled + padded so
                # it FITS its partition (SURVEY §3.2) — a case smaller than
                # the requested box clamps the box to the (padded) volume
                # instead of failing that case
                ms = model.max_stride
                psize = np.asarray(partition_size, np.int64)
                psize = (np.ceil(psize / ms) * ms).astype(np.int64)
                psize = np.minimum(psize, iso_size)
                pstride = np.asarray(partition_stride, np.int64) \
                    if partition_stride is not None else psize
                pstride = np.minimum(pstride, psize)
                patch = tuple(int(v) for v in psize[::-1])
                stride = tuple(int(v) for v in pstride[::-1])
            elif partition_type == SLAB:
                # full-XY slabs overlapping only in z: 2.5x fewer redundant
                # voxels than 96^3/stride-64 cubes at 512^3 (measured 18.2 vs
                # 7.1 volumes/min/chip) — the preferred large-volume mode on TPU
                pz = int(np.asarray(partition_size).reshape(-1)[0]) \
                    if partition_size is not None else 64
                pz = min(pz, int(iso_size[2]))
                sz = int(np.asarray(partition_stride).reshape(-1)[0]) \
                    if partition_stride is not None else max(pz - 16, 1)
                patch = (pz, int(iso_size[1]), int(iso_size[0]))
                stride = (sz, int(iso_size[1]), int(iso_size[0]))
                batch_size = 1
            elif partition_type == NUM:
                # fixed NUMBER of boxes per axis (reference partition_type='NUM')
                from segmentation3d_tpu.ops.geometry import num_partition_by_size
                psize, pstride = num_partition_by_size(iso_size, partition_size)
                ms = model.max_stride
                psize = (np.ceil(psize / ms) * ms).astype(np.int64)
                psize = np.minimum(psize, iso_size)
                patch = tuple(int(v) for v in psize[::-1])
                stride = tuple(int(v) for v in pstride[::-1])

            key = (patch, stride)
            if key not in inferers:
                members = []
                for mi, m in enumerate(models):
                    apply_fn, apply_vars = fused_forward_for(patch, mi)
                    if spatial_shard:  # single-model only (checked upstream)
                        from segmentation3d_tpu.core.spatial_shard import (
                            SpatialShardedInferer)
                        members.append(SpatialShardedInferer(
                            m.net, slab_z=patch[0],
                            num_classes=m.out_channels,
                            mesh=mesh, stride_z=stride[0], blend=blend,
                            apply_fn=apply_fn, apply_vars=apply_vars))
                    else:
                        members.append(SlidingWindowInferer(
                            m.net, patch, m.out_channels,
                            batch_size=batch_size,
                            blend=blend if stride != patch else "constant",
                            apply_fn=apply_fn, mesh=mesh,
                            apply_vars=apply_vars, tta=tta))
                inferers[key] = members
            infs = inferers[key]

            mask_vol, prob_out, native, secs = segmentation_one_case(
                model, image_paths, infs[0], stride_zyx=stride,
                save_prob=save_prob, post_processing=post_processing,
                shape_bucket=shape_bucket, vols=vols, dev_data=devs,
                defer_host=True,
                extra_members=list(zip(models[1:], infs[1:])))

            case_dir = os.path.join(output_dir, case_name)
            jobs = [(mask_vol, os.path.join(case_dir, seg_name))]
            if save_image:
                jobs.append((native, os.path.join(case_dir, "org.mha")))
            if prob_out:
                jobs.extend((p if isinstance(p, _DeferredVolume)
                             else Volume(p, native.frame),
                             os.path.join(case_dir, f"prob_{c}.mha"))
                            for c, p in prob_out)
            writer.submit(case_name, jobs)
        except Exception as e:
            print(f"ERROR: segmentation of {case_name} failed: {e}")
            failures.append((case_name, e))
            continue
        print(f"segmentation of {case_name}: {secs:.2f} s")
        results.append((case_name, secs))
