"""Packed-domain V-Net forward for TRAINING (differentiable, live BN).

``models/packed_vnet.py`` removes the layout-copy tax from INFERENCE by
keeping every op in the packed channels-minor [B,D,H,cols,P*C] form, but it
folds BatchNorm and prebuilds kernels from a fixed checkpoint. Training
needs live parameters, live batch statistics, and gradients — and a
profiled train step (96^3, batch 8, bf16, window convs) still spends ~32%
of its time in "data formatting" layout copies for exactly the same
reason.

This module is the training twin: a FUNCTIONAL apply (no flax modules in
the hot path) that reads the UNMODIFIED flax parameter tree of
``models/vnet.py:SegmentationNet`` — same names, same shapes, so
checkpoints, the torch-interop oracle, and the rest of the framework are
untouched — and computes the identical function in the packed domain:

- packed kernels are assembled from the live conv weights INSIDE the trace
  (``window_kernels``/``down_kernel``/``deconv_gemm`` — a few KB of
  scatter-assembly per step);
- BatchNorm reduces over the packed view ``[.., P, C] -> [C]`` (exactly
  the per-channel statistics of the unpacked layout) with flax semantics:
  biased batch variance, ``running = m*running + (1-m)*batch``, m=0.9,
  eps=1e-5, f32 statistics; the deconv's BN runs on the pre-unshuffle
  GEMM output (its folded dz/dy/xo axes are all spatial positions);
- all convs use the grad-safe lowering (conv output dtype == input dtype;
  see ``ops.packed_conv._conv_acc``). Under bf16 they emit bf16 directly
  and the conv bias is added inside the BN fusions (f32, grouped view), so
  no full-size f32 activation materializes — the profiled train step spent
  ~5.4 ms/step on ONE such 900 MB f32 write at the full-res level alone;
- per-level ``jax.checkpoint`` rematerialization when ``net.remat`` —
  levels RETURN their new BN stats (no side effects across the remat
  boundary).

Selected with ``cfg.tpu.conv_backend = 'packed_domain'`` (wired in
``core.seg_train.train``, which passes this module's apply as the train
step's ``apply_fn``; unknown backend strings are rejected there and in
``models.vnet``). Constraint: crop W % P0 == 0 where P0 is the in_block
packing (8 for base_channels=16) — every max_stride-legal crop qualifies;
the head packing Ph adapts to W (``ops.packed_conv.head_p_for``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.ops.packed_conv import (
    window_kernels, window_conv_packed, down_kernel, down_conv_packed,
    deconv_gemm, deconv_unshuffle, concat_packed,
    interleave_perm_np, head_p_for, _conv_acc)
from segmentation3d_tpu.models.packed_vnet import _p_for

_BN_MOMENTUM = 0.9
_BN_EPS = 1e-5


def _act(x, kind, alpha=None):
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "prelu":
        a = alpha.astype(x.dtype) if alpha is not None \
            else jnp.asarray(0.25, x.dtype)
        return jnp.where(x >= 0, x, a * x)
    if kind == "leaky_relu":
        return jax.nn.leaky_relu(x, 0.01)
    raise ValueError(kind)


def _bn(xp, P, bn_p, bn_s, train, bias=None):
    """BatchNorm over packed channels. ``xp``: [.., P*C] conv output (f32,
    or bf16 under the bf16 training path — upcast here, INSIDE the stats
    and normalize fusions, so the materialized activation stays bf16).
    ``bias`` [C]: the conv bias, added in f32 in the grouped view (it
    broadcasts over P) — hoisted out of the conv epilogue for the same
    reason. Returns (normalized f32, {"mean","var"} new stats or None)."""
    C = bn_p["scale"].shape[0]
    shape = xp.shape
    xg = xp.reshape(shape[:-1] + (P, C)).astype(jnp.float32)
    if bias is not None:
        xg = xg + bias.astype(jnp.float32)
    red = tuple(range(xg.ndim - 1))
    if train:
        bmean = xg.mean(axis=red)
        bvar = jnp.maximum((xg * xg).mean(axis=red) - bmean * bmean, 0.0)
        new = {"mean": _BN_MOMENTUM * bn_s["mean"] + (1 - _BN_MOMENTUM) * bmean,
               "var": _BN_MOMENTUM * bn_s["var"] + (1 - _BN_MOMENTUM) * bvar}
        um, uv = bmean, bvar
    else:
        new = None
        um, uv = bn_s["mean"], bn_s["var"]
    y = (xg - um) * jax.lax.rsqrt(uv + _BN_EPS)
    y = y * bn_p["scale"] + bn_p["bias"]
    return y.reshape(shape), new


def build_packed_train_apply(net: SegmentationNet, packed_probs: bool = False):
    """Returns ``apply_fn(variables, x, train=False, mutable=None)``
    mirroring ``net.apply`` (probs, or ``(probs, {"batch_stats": ...})``
    when ``mutable`` contains "batch_stats").

    ``packed_probs=True`` keeps the output in the packed x-major form
    [B, D, H, W/Ph, Ph*nc] (``Ph = head_p_for(W, nc)``) for a packed-domain
    loss (``losses.packed``): unpacking to [.., W, nc] materializes a
    minor-dim-``nc`` tensor that every loss op then reads lane-padded
    128/nc — profiled at ~25% of the config-#3 train step."""
    if net.bottleneck:
        raise NotImplementedError("packed training forward supports the "
                                  "standard (non-bottleneck) V-Net blocks")
    act_kind = net.act
    dtype = net.dtype
    # bf16 training: convs emit bf16 (the grad-safe lowering minus its f32
    # upcast — see ops.packed_conv._conv_acc), bias rides inside the BN
    # fusions in f32, so no full-size f32 activation ever materializes.
    # Measured (config #3, 96^3 batch 8): see BASELINE.md round-3 rows.
    acc = "bf16" if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    nc = net.out_channels
    base = net.base_channels
    down_convs = list(net.down_convs)
    up_convs = list(net.up_convs)
    P0 = _p_for(base)

    def alpha_of(pp, name="act"):
        if act_kind == "prelu" and name in pp:
            return pp[name]["alpha"]
        return None

    def conv_bn_act(pp, ss, xp, P, cin, train):
        """3x3x3 conv+BN+act on the packed form -> (out, new_bn | None)."""
        w = pp["conv"]["kernel"].astype(dtype)
        b = pp["conv"]["bias"]
        if P > 1:
            mid, wl, wr = window_kernels(w, P)
            out = window_conv_packed(xp, mid, wl, wr, None, P=P, cin=cin,
                                     grad_safe=True, accum=acc)
        else:
            out = _conv_acc(xp.astype(dtype), w, (1, 1, 1), "SAME",
                            ("NDHWC", "DHWIO", "NDHWC"), True, acc)
        out, new = _bn(out, P, pp["bn"], ss["bn"], train, bias=b)
        return _act(out, act_kind, alpha_of(pp)).astype(dtype), new

    def res_block(pp, ss, xp, P, cin, n, train):
        """-> (out, {"conv{i}": {"bn": new}} for train)."""
        h, c, stats = xp, cin, {}
        for i in range(n):
            h, new = conv_bn_act(pp[f"conv{i}"], ss[f"conv{i}"], h, P, c,
                                 train)
            c = pp[f"conv{i}"]["conv"]["kernel"].shape[-1]
            if new is not None:
                stats[f"conv{i}"] = {"bn": new}
        out = _act(xp + h, act_kind, alpha_of(pp, "act_out")).astype(dtype)
        return out, stats

    def down_level(pp, ss, xp, P, cout, nconv, train):
        """stride-2 down conv + BN + act + res block -> (out, stats)."""
        stats = {}
        if P > 1:
            k = down_kernel(pp["down_conv"]["kernel"].astype(dtype), P)
            out = down_conv_packed(xp, k, grad_safe=True, accum=acc)
        else:
            out = _conv_acc(xp.astype(dtype),
                            pp["down_conv"]["kernel"].astype(dtype),
                            (2, 2, 2), ((0, 0), (0, 0), (0, 0)),
                            ("NDHWC", "DHWIO", "NDHWC"), True, acc)
        P2 = max(P // 2, 1)
        out, new = _bn(out, P2, pp["down_bn"], ss["down_bn"], train,
                       bias=pp["down_conv"]["bias"])
        if new is not None:
            stats["down_bn"] = new
        out = _act(out, act_kind, alpha_of(pp, "down_act")).astype(dtype)
        out, rstats = res_block(pp["res"], ss["res"], out, P2, cout, nconv,
                                train)
        if rstats:
            stats["res"] = rstats
        return out, stats

    def up_level(pp, ss, xp, skip, P, skip_P, skip_c, cfeat, nconv, perm,
                 train):
        """deconv GEMM + BN(pre-unshuffle) + act + unshuffle + concat +
        res block -> (out, stats)."""
        stats = {}
        up = cfeat // 2
        B, Dh, Hh, cols, _ = xp.shape
        k = deconv_gemm(pp["up_conv"]["kernel"].astype(dtype), P)
        y = _conv_acc(xp.astype(dtype), k, (1, 1, 1),
                      ((0, 0), (0, 0), (0, 0)),
                      ("NDHWC", "DHWIO", "NDHWC"), True, acc)  # [..,8P*up]
        # BN on the folded form: (dz,dy,xo) are spatial positions
        y, new = _bn(y, 8 * P, pp["up_bn"], ss["up_bn"], train,
                     bias=pp["up_conv"]["bias"])
        if new is not None:
            stats["up_bn"] = new
        y = _act(y, act_kind, alpha_of(pp, "up_act")).astype(dtype)
        ya = deconv_unshuffle(y.reshape(B, Dh, Hh, cols, 2, 2, 2 * P * up))
        if 2 * P != skip_P:       # free repack onto the skip's packing
            ya = ya.reshape(ya.shape[:3] + (-1, skip_P * up))
        xc = concat_packed(ya, skip, up, skip_c, perm=perm)
        out, rstats = res_block(pp["res"], ss["res"], xc, skip_P, cfeat,
                                nconv, train)
        if rstats:
            stats["res"] = rstats
        return out, stats

    # static concat permutations per decoder level (0/1 matrices)
    perms = {}
    c, P = base, P0
    enc_meta = []
    for _ in down_convs:
        enc_meta.append((c, P))
        c *= 2
        P = max(P // 2, 1)
    for _ in up_convs:
        skip_c, skip_P = enc_meta.pop()
        if skip_P > 1:
            perms[c] = jnp.asarray(interleave_perm_np(skip_P, c // 2, skip_c))
        c //= 2

    maybe_ckpt = (lambda f, n_static: jax.checkpoint(
        f, static_argnums=n_static)) if net.remat else (lambda f, n: f)
    down_fn = maybe_ckpt(down_level, (3, 4, 5, 6))
    up_fn = maybe_ckpt(up_level, (4, 5, 6, 7, 8, 10))

    def apply_fn(variables, x, train=False, mutable=None):
        p = variables["params"]
        s = variables["batch_stats"]
        stats_out = {}
        B, D, H, W, _ = x.shape
        assert W % P0 == 0, (
            f"packed-domain training requires crop W % {P0} == 0 "
            f"(the in_block packing for base_channels={base}); got W={W}")
        # head packing adapts to W (>= 16 for max_stride-legal crops)
        Ph = head_p_for(W, nc)
        xp = x.astype(dtype).reshape(B, D, H, W // P0, P0 * net.in_channels)
        xp, new = conv_bn_act(p["in_block"]["conv"], s["in_block"]["conv"],
                              xp, P0, net.in_channels, train)
        if new is not None:
            stats_out["in_block"] = {"conv": {"bn": new}}

        c, P = base, P0
        skips = []
        for nconv in down_convs:
            skips.append((xp, c, P))
            c *= 2
            xp, lstats = down_fn(p[f"down_{c}"], s[f"down_{c}"], xp, P, c,
                                 nconv, train)
            if lstats:
                stats_out[f"down_{c}"] = _lift_res(lstats)
            P = max(P // 2, 1)
        for nconv in up_convs:
            skip, skip_c, skip_P = skips.pop()
            xp, lstats = up_fn(p[f"up_{c}"], s[f"up_{c}"], xp, skip, P,
                               skip_P, skip_c, c, nconv, perms.get(c), train)
            if lstats:
                stats_out[f"up_{c}"] = _lift_res(lstats)
            P = skip_P
            c //= 2

        # head at Ph (free repack), proj as block-diagonal GEMM, softmax
        cols = xp.shape[3]
        Wf = cols * P
        xp = xp.reshape(B, D, H, Wf // Ph, Ph * 2 * base)
        pp, ss = p["out_block"], s["out_block"]
        xp, new = conv_bn_act(pp["conv"], ss["conv"], xp, Ph, 2 * base,
                              train)
        if new is not None:
            stats_out["out_block"] = {"conv": {"bn": new}}
        wp = pp["proj"]["kernel"].astype(dtype)  # [1,1,1,nc,nc]
        bd = jnp.zeros((1, 1, 1, Ph * nc, Ph * nc), dtype)
        for xo in range(Ph):
            bd = bd.at[0, 0, 0, xo * nc:(xo + 1) * nc,
                       xo * nc:(xo + 1) * nc].set(wp[0, 0, 0])
        logits = _conv_acc(xp.astype(dtype), bd, (1, 1, 1),
                           ((0, 0), (0, 0), (0, 0)),
                           ("NDHWC", "DHWIO", "NDHWC"), True, acc)
        logits = logits + jnp.tile(
            pp["proj"]["bias"].astype(logits.dtype),
            (Ph,)).reshape(1, 1, 1, 1, -1)
        lg = logits.reshape(B, D, H, Wf // Ph, Ph, nc)
        prob = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        if packed_probs:
            prob = prob.reshape(B, D, H, Wf // Ph, Ph * nc)
        else:
            prob = prob.reshape(B, D, H, Wf, nc)

        if mutable and "batch_stats" in mutable:
            return prob, {"batch_stats": _merged(s, stats_out)}
        return prob

    return apply_fn


def _lift_res(lstats):
    """Level stats {'down_bn'|'up_bn': new, 'res': {...}} -> the nested
    shape of the flax batch_stats tree for that level."""
    out = {}
    for k, v in lstats.items():
        if k in ("down_bn", "up_bn"):
            out[k] = v
        elif k == "res":
            out["res"] = {ck: cv for ck, cv in v.items()}
    return out


def _merged(stats, updates):
    """New batch_stats tree: ``stats`` with ``updates`` (a sparse nested
    dict of the same structure) replacing the touched leaves."""
    if not isinstance(stats, dict):
        return updates if updates is not None else stats
    out = {}
    for k, v in stats.items():
        if isinstance(updates, dict) and k in updates:
            out[k] = _merged(v, updates[k])
        else:
            out[k] = v
    return out
