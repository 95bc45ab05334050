"""Sliding-window inference engine — batched patches, on-device blending.

This is the TPU-native replacement for the reference's per-patch serial loop
(``core/seg_infer.py:segmentation_one_case`` ≈L150-260), which forwarded one
patch at a time with a host->device copy per patch and host-side pasting.
Here the entire volume pass is ONE jitted program:

- patches are gathered from the (already device-resident, normalized) volume
  with ``dynamic_slice`` and forwarded in batches through the net;
- per-class probabilities are blended into a full-volume accumulator with a
  per-patch weight map (constant or Gaussian — weighted averaging subsumes
  the reference's overlap rule, SURVEY.md C11 [M]);
- argmax and the weight division happen on device; only the final mask
  leaves the chip.

Multi-chip: pass ``mesh=`` (a 1-D ``data`` mesh). The box-batch axis is then
split over the mesh with ``shard_map`` — each chip scans its own share of
patch batches into a local (prob, wsum) accumulator pair, and ONE ``psum``
per volume merges the accumulators over ICI (weighted blending is a sum of
``w*p`` terms, so the merge is exact up to float reduction order). The
volume itself is replicated; sharding ONE huge volume spatially lives in
:mod:`segmentation3d_tpu.core.spatial_shard`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from segmentation3d_tpu.ops.geometry import partition_boxes


def make_weight_map(patch_size_zyx, kind: str = "gaussian", sigma_scale: float = 0.125):
    """Per-patch blending weights [pd,ph,pw,1]; 'constant' = plain averaging."""
    pd, ph, pw = patch_size_zyx
    if kind == "constant":
        return np.ones((pd, ph, pw, 1), np.float32)
    zz = np.linspace(-1.0, 1.0, pd)
    yy = np.linspace(-1.0, 1.0, ph)
    xx = np.linspace(-1.0, 1.0, pw)
    sig = 2.0 * sigma_scale
    gz = np.exp(-0.5 * (zz / sig) ** 2)
    gy = np.exp(-0.5 * (yy / sig) ** 2)
    gx = np.exp(-0.5 * (xx / sig) ** 2)
    w = gz[:, None, None] * gy[None, :, None] * gx[None, None, :]
    w = np.maximum(w, w.max() * 1e-3).astype(np.float32)
    return w[..., None]


def weight_map_traced(patch_size_zyx, kind: str = "gaussian",
                      sigma_scale: float = 0.125, dtype=jnp.float32):
    """:func:`make_weight_map` built INSIDE the trace from three 1-D
    gaussians (separable outer product). A 64x512^2 slab map materialized
    as a closure constant put 67 MB into the HLO — hashing/serializing it
    dominated first-call latency on the remote-compile link; as ~30 traced
    flops it costs nothing and the HLO stays shape-only."""
    pd, ph, pw = patch_size_zyx
    if kind == "constant":
        return jnp.ones((pd, ph, pw, 1), dtype)
    sig = 2.0 * sigma_scale

    def g(n):
        t = jnp.linspace(-1.0, 1.0, n)
        return jnp.exp(-0.5 * (t / sig) ** 2)

    w = g(pd)[:, None, None] * g(ph)[None, :, None] * g(pw)[None, None, :]
    w = jnp.maximum(w, jnp.max(w) * 1e-3)
    return w[..., None].astype(dtype)


def tta_axes(tta):
    """Normalize a TTA spec — None/''/'none', 'all', an 'xz'/'x,z' string,
    or an iterable of axis names — to a canonical ('z','y','x')-ordered
    tuple of unique axis names."""
    if tta is None:
        return ()
    if isinstance(tta, str):
        t = tta.strip().lower().replace(",", "")
        if t in ("", "none"):
            return ()
        tta = "zyx" if t == "all" else t
    axes = {str(a).strip().lower() for a in tta}
    bad = axes - {"z", "y", "x"}
    if bad:
        raise ValueError(f"tta axes must be from z/y/x (or 'all'), "
                         f"got {sorted(bad)}")
    return tuple(a for a in ("z", "y", "x") if a in axes)


def tta_flip_combos(axes):
    """All non-empty flip combinations of the named patch axes, as tuples of
    tensor dims of a [B, z, y, x, C] patch batch (z=1, y=2, x=3)."""
    dim = {"z": 1, "y": 2, "x": 3}
    dims = [dim[a] for a in tta_axes(axes)]
    combos = []
    for bits in range(1, 1 << len(dims)):
        combos.append(tuple(d for i, d in enumerate(dims) if bits >> i & 1))
    return tuple(combos)


class SlidingWindowInferer:
    """Jitted whole-volume inference: partition -> batched forward -> blend.

    One compiled program per (volume shape, #box-batches); compilations are
    cached across cases of the same padded shape.
    """

    def __init__(self, net, patch_size_zyx, num_classes, batch_size=8,
                 blend="gaussian", out_dtype=jnp.float32, apply_fn=None,
                 mesh=None, apply_vars=None, packed_tail=False, tta=None):
        self.net = net
        self.apply_fn = apply_fn  # overrides net.apply (e.g. fused forward)
        self.patch_size = tuple(int(v) for v in patch_size_zyx)
        self.num_classes = int(num_classes)
        self.batch_size = int(batch_size)
        self.blend = blend  # weight map is built inside the trace
        self.packed_tail = bool(packed_tail)
        # test-time mirror augmentation: average the per-patch probabilities
        # over every flip combination of the given axes (2^n forwards per
        # patch — an opt-in accuracy/compute trade; beyond the reference,
        # which has no TTA). Axes name the PATCH's spatial dims z/y/x.
        self.tta = tta_axes(tta)
        self._tta_flips = tta_flip_combos(self.tta)
        if self._tta_flips and self.packed_tail:
            raise ValueError("tta is not supported with packed_tail "
                             "(flips need the unpacked [.., W, NC] output)")
        self.out_dtype = out_dtype
        # multi-chip: split the box-batch axis over mesh axis "data"
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        # apply_fn's own parameter tree (e.g. the fused forward's folded
        # kernels): staged to device ONCE here, substituted for the caller's
        # ``variables`` at every __call__
        self.apply_vars = None
        if apply_vars is not None:
            import jax as _jax
            self.apply_vars = _jax.device_put(apply_vars)

    def boxes_for(self, vol_shape_zyx, stride_zyx=None):
        """Patch start coordinates (N,3) zyx for a volume shape."""
        pd, ph, pw = self.patch_size
        if stride_zyx is None:
            stride_zyx = self.patch_size
        size_xyz = np.asarray(vol_shape_zyx, np.int64)[::-1]
        boxes_xyz = partition_boxes(size_xyz, (pw, ph, pd), np.asarray(stride_zyx)[::-1])
        return np.ascontiguousarray(boxes_xyz[:, ::-1])  # -> zyx starts

    def _packed_p(self, vol_shape):
        """Head packing Ph when the PACKED blend tail applies (opt-in
        ``packed_tail=True``): the fused forward can emit probabilities
        still in the packed head form, and for slab patches (full-XY;
        every paste offset is (z,0,0)) the accumulators, blend, divide,
        and argmax can all stay in [.., cols, Ph*NC]. Measured on the
        512^3 slab headline: 53.1 vs 54.2 volumes/min for the default
        unpacked tail — XLA already fuses the unpacked tail well (the
        argmax reduce is ~1.6 ms/volume), so the packed form's extra
        repeat/reshape traffic loses slightly; kept opt-in for
        many-class heads where the unpacked [.., W, NC] tail pads NC up
        to the 128-lane width. Returns None when not applicable."""
        if not self.packed_tail:
            return None
        pd, ph, pw = self.patch_size
        p = getattr(self.apply_fn, "packed_head_p", None)
        if p and (ph, pw) == tuple(vol_shape[1:3]) and pw % p == 0:
            return int(p)
        return None

    def _accumulate(self, variables, vol, boxes, box_mask):
        """Scan forward+paste over box batches into LOCAL accumulators.

        vol: [D,H,W,Cin]; boxes: [NB, B, 3] zyx starts; box_mask: [NB, B].
        Returns (prob, wsum, Ph) — unnormalized; packed tail when Ph else
        ``prob [D,H,W,NC], wsum [D,H,W,1]``.
        """
        pd, ph, pw = self.patch_size
        cin = vol.shape[-1]
        nc = self.num_classes
        Ph = self._packed_p(vol.shape)
        weight = weight_map_traced(self.patch_size, self.blend,
                                   dtype=self.out_dtype)
        if Ph:
            cols = vol.shape[2] // Ph
            prob = jnp.zeros(vol.shape[:2] + (cols, Ph * nc), self.out_dtype)
            wsum = jnp.zeros(vol.shape[:2] + (cols, Ph), self.out_dtype)
            # per-x-position weights in the packed view (free reshape),
            # repeated per class to align with the xo*NC+c channel order
            w_pk = weight[..., 0].reshape(pd, ph, cols, Ph)
            w_cls = jnp.repeat(w_pk, nc, axis=-1)
        else:
            prob = jnp.zeros(vol.shape[:3] + (nc,), self.out_dtype)
            wsum = jnp.zeros(vol.shape[:3] + (1,), self.out_dtype)

        def fwd(patches):
            if Ph:
                return self.apply_fn(variables, patches, train=False,
                                     return_packed=True)
            if self.apply_fn is not None:
                apply = lambda p: self.apply_fn(variables, p, train=False)
            else:
                apply = lambda p: self.net.apply(variables, p, train=False)
            out = apply(patches)
            for dims in self._tta_flips:  # static unroll: 2^n - 1 mirrors
                out = out + jnp.flip(apply(jnp.flip(patches, dims)), dims)
            if self._tta_flips:
                out = out / np.float32(1 + len(self._tta_flips))
            return out

        def body(carry, inp):
            prob, wsum = carry
            bxs, mask = inp  # [B,3], [B]

            def take(b):
                return jax.lax.dynamic_slice(vol, (b[0], b[1], b[2], 0), (pd, ph, pw, cin))

            patches = jax.vmap(take)(bxs)                      # [B,pd,ph,pw,Cin]
            probs = fwd(patches).astype(self.out_dtype)

            def paste(carry, inp2):
                prob, wsum = carry
                b, p, m = inp2
                if Ph:  # slab: paste offset is (z, 0, 0) by construction
                    wp = w_cls * m
                    cur_p = jax.lax.dynamic_slice(
                        prob, (b[0], 0, 0, 0), (pd, ph, cols, Ph * nc))
                    prob = jax.lax.dynamic_update_slice(
                        prob, cur_p + p * wp, (b[0], 0, 0, 0))
                    cur_w = jax.lax.dynamic_slice(
                        wsum, (b[0], 0, 0, 0), (pd, ph, cols, Ph))
                    wsum = jax.lax.dynamic_update_slice(
                        wsum, cur_w + w_pk * m, (b[0], 0, 0, 0))
                    return (prob, wsum), None
                w = weight * m
                cur_p = jax.lax.dynamic_slice(prob, (b[0], b[1], b[2], 0), (pd, ph, pw, nc))
                prob = jax.lax.dynamic_update_slice(prob, cur_p + p * w, (b[0], b[1], b[2], 0))
                cur_w = jax.lax.dynamic_slice(wsum, (b[0], b[1], b[2], 0), (pd, ph, pw, 1))
                wsum = jax.lax.dynamic_update_slice(wsum, cur_w + w, (b[0], b[1], b[2], 0))
                return (prob, wsum), None

            (prob, wsum), _ = jax.lax.scan(
                paste, (prob, wsum), (bxs, probs, mask.astype(self.out_dtype)))
            return (prob, wsum), None

        (prob, wsum), _ = jax.lax.scan(body, (prob, wsum), (boxes, box_mask))
        return prob, wsum, Ph

    def _finalize(self, prob, wsum, Ph=None):
        if Ph:
            nc = self.num_classes
            D, H, cols, _ = prob.shape
            prob = prob / jnp.maximum(jnp.repeat(wsum, nc, axis=-1), 1e-8)
            pr = prob.reshape(D, H, cols, Ph, nc)
            mask = jnp.argmax(pr, axis=-1).astype(jnp.uint8)
            return pr.reshape(D, H, cols * Ph, nc), mask.reshape(D, H, cols * Ph)
        prob = prob / jnp.maximum(wsum, 1e-8)
        mask = jnp.argmax(prob, axis=-1).astype(jnp.uint8)
        return prob, mask

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run(self, variables, vol, boxes, box_mask):
        prob, wsum, Ph = self._accumulate(variables, vol, boxes, box_mask)
        return self._finalize(prob, wsum, Ph)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run_dice(self, variables, vol, boxes, box_mask, gt, valid):
        """Whole-volume inference + per-class Dice sums ON DEVICE.

        Validation's scoring is a reduction, so it belongs on the chip: the
        host used to read back a full int mask per case over the slow D2H
        relay direction (a 320^3 int32 mask is ~131 MB at ~3-20 MB/s —
        BASELINE.md round-4 measured 34.8 s/save point); this program reads
        back ``2*(num_classes-1)`` floats instead. ``gt`` is the iso-grid
        ground-truth label volume [D,H,W] (any real dtype with exact integer
        values); ``valid`` is a TRACED int32[3] (vz,vy,vx) bound of the
        unpadded region — traced so per-case valid sizes share one compiled
        program per shape bucket. Returns [num_classes-1, 2] f32 of
        (intersection, |gt==c| + |pred==c|) over the valid region."""
        prob, wsum, Ph = self._accumulate(variables, vol, boxes, box_mask)
        _, seg = self._finalize(prob, wsum, Ph)
        seg = seg.astype(jnp.int32)
        gt = gt.astype(jnp.int32)
        D, H, W = seg.shape
        validm = ((jnp.arange(D, dtype=jnp.int32)[:, None, None] < valid[0])
                  & (jnp.arange(H, dtype=jnp.int32)[None, :, None] < valid[1])
                  & (jnp.arange(W, dtype=jnp.int32)[None, None, :] < valid[2]))
        rows = []
        for c in range(1, self.num_classes):
            pc = (seg == c) & validm
            gc = (gt == c) & validm
            inter = jnp.sum((pc & gc).astype(jnp.float32))
            denom = (jnp.sum(pc.astype(jnp.float32))
                     + jnp.sum(gc.astype(jnp.float32)))
            rows.append(jnp.stack([inter, denom]))
        return jnp.stack(rows)

    def dice(self, variables, vol, gt, valid_zyx, stride_zyx=None):
        """Per-class Dice of the sliding-window prediction against ``gt``,
        computed on device — only ``[num_classes-1, 2]`` floats cross the
        link. ``valid_zyx``: (vz,vy,vx) unpadded-region bound (scored region;
        bucket-padding fill is excluded). Returns a numpy [NC-1] array of
        ``2*inter / max(denom, 1)`` values."""
        if vol.ndim == 3:
            vol = vol[..., None]
        if self.apply_vars is not None:
            variables = self.apply_vars
        if self.mesh is not None:
            raise NotImplementedError("on-device dice is single-chip "
                                      "(validation never builds a mesh)")
        boxes = self.boxes_for(vol.shape[:3], stride_zyx)
        n = len(boxes)
        b = min(self.batch_size, n)
        nb = -(-n // b)
        padded = np.zeros((nb * b, 3), np.int32)
        padded[:n] = boxes
        mask = np.zeros((nb * b,), np.float32)
        mask[:n] = 1.0
        sums = np.asarray(self._run_dice(
            variables, vol, jnp.asarray(padded.reshape(nb, b, 3)),
            jnp.asarray(mask.reshape(nb, b)), gt,
            jnp.asarray(np.asarray(valid_zyx, np.int32))))
        return 2.0 * sums[:, 0] / np.maximum(sums[:, 1], 1.0)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run_sharded(self, variables, vol, boxes, box_mask):
        """Patch-parallel multi-chip run: boxes [NB, B, 3] with NB divisible
        by the mesh size. Each device scans NB/n_dev box batches locally;
        one psum over ICI merges the (prob, wsum) accumulators (SURVEY.md
        C11/P2: patches pjit-forwarded across the mesh, results gathered by
        a collective)."""

        def local(variables, vol, bxs, msk):
            prob, wsum, _ = self._accumulate(variables, vol, bxs, msk)
            prob = jax.lax.psum(prob, "data")
            wsum = jax.lax.psum(wsum, "data")
            return prob, wsum

        # check_vma=False: the scan carry starts as replicated zeros and
        # becomes device-varying after the first paste of a sharded patch —
        # exactly the intent, but the varying-manual-axes checker rejects the
        # carry type change.
        prob, wsum = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=(P(), P()), check_vma=False)(variables, vol, boxes, box_mask)
        return self._finalize(prob, wsum, self._packed_p(vol.shape))

    def __call__(self, variables, vol, stride_zyx=None, return_prob=False):
        """Run sliding-window inference on a device volume [D,H,W,Cin].

        Returns ``mask [D,H,W] uint8`` (+ ``prob [D,H,W,NC]`` if requested).
        """
        if vol.ndim == 3:
            vol = vol[..., None]
        if self.apply_vars is not None:
            variables = self.apply_vars
        boxes = self.boxes_for(vol.shape[:3], stride_zyx)
        n = len(boxes)
        b = min(self.batch_size, n)
        nb = -(-n // b)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        nb = -(-nb // n_dev) * n_dev  # box batches divide evenly over chips
        padded = np.zeros((nb * b, 3), np.int32)
        padded[:n] = boxes
        mask = np.zeros((nb * b,), np.float32)
        mask[:n] = 1.0
        boxes_d = jnp.asarray(padded.reshape(nb, b, 3))
        mask_d = jnp.asarray(mask.reshape(nb, b))
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            boxes_d = jax.device_put(boxes_d, shard)
            mask_d = jax.device_put(mask_d, shard)
            vol = jax.device_put(vol, repl)
            variables = jax.device_put(variables, repl)
            prob, seg = self._run_sharded(variables, vol, boxes_d, mask_d)
        else:
            prob, seg = self._run(variables, vol, boxes_d, mask_d)
        if return_prob:
            return seg, prob
        return seg
