"""Fused inference forward for V-Net: BN folding + lane-packed thin convs.

At inference BatchNorm is a per-channel affine, so it folds into the
preceding conv's weights/bias (``ops.pallas_conv.fold_bn``); the activation
then fuses into the conv epilogue.

Thin-channel stages (XLA pads Cout to the 128-lane MXU width: measured
0.4-12 TF/s useful on V-Net's high-res stages) route through the
window-GEMM conv (:func:`segmentation3d_tpu.ops.packed_conv.window_conv3d`)
by default — measured per-conv on TPU v5e (64x512^2 slab planes, bf16,
``benchmarks/bench_convs.py``): stem 40.4 (direct) / 12.5 (packed) /
7.8 ms (window); up32res 81 / 45 / 33; head 104 / 39 / 20; full slab
forward 209 -> 193 ms packed -> window. The channel-packed conv
(:func:`~segmentation3d_tpu.ops.packed_conv.packed_conv3d`) is the
fallback, the Pallas kernel
(:func:`segmentation3d_tpu.ops.pallas_conv.thin_conv3d`) and the
pixel-shuffle deconv (:func:`~segmentation3d_tpu.ops.packed_conv.deconv2x`)
are opt-in (``pallas_sites``/``use_pallas``/``use_deconv2x``): both win
isolated at some sites but lose in-net — the Pallas head OOMs the 512^3
slab program at compile, deconv2x breaks fusion with the following
concat+res conv (235 vs 204 ms/slab measured). Everything else (stride-2
down convs, wide convs, 1x1 projection) stays on direct XLA convs.

``build_fused_forward(net, variables)`` returns ``apply_fn(variables, x,
train=False)`` computing the same function as ``net.apply(variables, x,
train=False)`` (within bf16 tolerance) — drop-in for
``SlidingWindowInferer(apply_fn=...)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.ops.pallas_conv import thin_conv3d, fold_bn
from segmentation3d_tpu.ops.packed_conv import (
    packed_conv3d, window_conv3d, deconv2x, pick_p, pick_window_p)

# route a stride-1 3x3x3 conv through Pallas when Cout is this thin or less
PALLAS_COUT_MAX = 32


def _act(x, kind, alpha=0.25):
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "prelu":
        return jnp.where(x >= 0, x, alpha * x)
    if kind == "none":
        return x
    raise ValueError(kind)


def _xla_conv(x, w, b, strides=(1, 1, 1), padding="SAME", dtype=jnp.bfloat16):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), strides, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape(1, 1, 1, 1, -1).astype(jnp.float32)
    return out


def build_fused_forward(net: SegmentationNet, variables, dtype=jnp.bfloat16,
                        use_pallas: bool | None = None, interpret: bool = False,
                        pallas_sites: frozenset | None = None,
                        packed_sites: frozenset | None = None,
                        window_sites: frozenset | None = None,
                        use_deconv2x: bool = False,
                        wide_xy: bool = False,
                        window_couts: tuple | None = None):
    # Measured routing defaults (benchmarks/bench_convs.py, TPU v5e, bf16,
    # 64x512^2 slab planes): thin stride-1 3^3 convs -> window-GEMM conv
    # (stem 12.5->8.8 ms vs packed, res16 25.2->17.2, up32res 45.3->33.0);
    # the 32->2 head -> Pallas y-tiled kernel on TPU (18.3 ms vs packed
    # 39.0 / best window 21.9). ``pallas_sites``/``use_pallas`` widen the
    # Pallas routing for experiments; on non-TPU backends Pallas is skipped
    # (Mosaic kernels don't lower there) and the head takes the window path.
    """Build the fused apply function. Captures folded weights as constants
    of the returned closure (re-build after loading new variables)."""
    del wide_xy  # routing no longer shape-dependent (kept for API compat)
    if pallas_sites is None:
        # Pallas stays opt-in: the y-tiled head kernel wins isolated
        # (18.3 ms vs window 21.9 on the 64x512^2 head) but OOMs the slab
        # forward at COMPILE time (26.7G of 8-16x tile-padded remat copies
        # around the kernel's layout boundaries).
        pallas_sites = frozenset({"stem", "res", "head"}) if use_pallas \
            else frozenset()
    if window_sites is None:
        window_sites = frozenset({"stem", "res", "head"})  # measured default
    if packed_sites is None:
        packed_sites = frozenset({"stem", "res", "head"})  # window's fallback
    if net.bottleneck:
        raise NotImplementedError("fused forward supports the standard "
                                  "(non-bottleneck) V-Net blocks")
    p = variables["params"]
    s = variables["batch_stats"]
    act_kind = net.act

    def folded(pp, ss):
        return fold_bn(pp["conv"]["kernel"],
                       pp["conv"].get("bias"),
                       pp["bn"]["scale"], pp["bn"]["bias"],
                       ss["bn"]["mean"], ss["bn"]["var"])

    def alpha_of(pp, name):
        if act_kind == "prelu" and name in pp:
            return float(jnp.reshape(pp[name]["alpha"], ())[...])
        return 0.25

    def conv_bn_act(x, pp, ss, act=True, pname="act", site="res"):
        w, b = folded(pp, ss)
        cout = w.shape[-1]
        kind = act_kind if act else "none"
        alpha = alpha_of(pp, pname)
        if (site in pallas_sites and w.shape[:3] == (3, 3, 3)
                and cout <= PALLAS_COUT_MAX and x.shape[3] >= 8):
            return thin_conv3d(x.astype(dtype), w, b, act=kind, alpha=alpha,
                               out_dtype=dtype, interpret=interpret)
        if (site in window_sites and w.shape[:3] == (3, 3, 3)
                and pick_window_p(cout) > 1
                and (window_couts is None or cout in window_couts)):
            out = window_conv3d(x.astype(dtype), w, b, out_dtype=jnp.float32)
            return _act(out, kind, alpha).astype(dtype)
        if (site in packed_sites and w.shape[:3] == (3, 3, 3)
                and pick_p(w.shape[3], cout) > 1):
            out = packed_conv3d(x.astype(dtype), w, b, out_dtype=jnp.float32)
            return _act(out, kind, alpha).astype(dtype)
        out = _xla_conv(x, w, b)
        return _act(out, kind, alpha).astype(dtype)

    def strided_bn_act(x, pp, conv_name, bn_name, act_name, ss, transpose=False):
        w, b = fold_bn(pp[conv_name]["kernel"], pp[conv_name].get("bias"),
                       pp[bn_name]["scale"], pp[bn_name]["bias"],
                       ss[bn_name]["mean"], ss[bn_name]["var"])
        if transpose and use_deconv2x:
            # k=2/s=2 deconv == pixel-shuffle GEMM. Isolated it beats the
            # direct conv_transpose lowering, but IN-NET (all packed sites)
            # the interleave transpose breaks fusion with the following
            # concat+res conv: 235 vs 204 ms/slab-fwd measured — so the
            # default stays on conv_transpose; this is the opt-in variant.
            out = deconv2x(x.astype(dtype), w, b, out_dtype=jnp.float32)
        elif transpose:
            out = jax.lax.conv_transpose(
                x.astype(dtype), w.astype(dtype), (2, 2, 2), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            out = out + b.reshape(1, 1, 1, 1, -1).astype(jnp.float32)
        else:
            out = _xla_conv(x, w, b, strides=(2, 2, 2), padding="VALID")
        return _act(out, act_kind, alpha_of(pp, act_name)).astype(dtype)

    def res_block(x, pp, ss, num_convs):
        if num_convs == 1 and "res" in pallas_sites:
            # single-conv residual blocks (all the thin ones in this V-Net)
            # fuse ENTIRELY into one kernel pass: conv+bn+act+add+act_out,
            # identity read from the already-resident center plane
            w, b = folded(pp["conv0"], ss["conv0"])
            if (w.shape[:3] == (3, 3, 3) and w.shape[3] == w.shape[4]
                    and w.shape[4] <= PALLAS_COUT_MAX and x.shape[3] >= 8):
                return thin_conv3d(
                    x.astype(dtype), w, b, act=act_kind,
                    alpha=alpha_of(pp["conv0"], "act"), out_dtype=dtype,
                    interpret=interpret, residual=act_kind,
                    res_alpha=alpha_of(pp, "act_out"))
        h = x
        for i in range(num_convs):
            h = conv_bn_act(h, pp[f"conv{i}"], ss[f"conv{i}"], act=True)
        return _act(x + h, act_kind, alpha_of(pp, "act_out")).astype(dtype)

    down_convs = list(net.down_convs)
    up_convs = list(net.up_convs)
    base = net.base_channels

    def apply_fn(_variables, x, train=False, return_logits=False):
        del _variables, train  # folded weights are closure constants
        x = x.astype(dtype)
        c = base
        skips = []
        x = conv_bn_act(x, p["in_block"]["conv"], s["in_block"]["conv"],
                        site="stem")
        skips.append(x)
        n = len(down_convs)
        for i, nconv in enumerate(down_convs):
            c *= 2
            pp, ss = p[f"down_{c}"], s[f"down_{c}"]
            x = strided_bn_act(x, pp, "down_conv", "down_bn", "down_act", ss)
            x = res_block(x, pp["res"], ss["res"], nconv)
            if i + 1 < n:
                skips.append(x)
        for nconv in up_convs:
            pp, ss = p[f"up_{c}"], s[f"up_{c}"]
            skip = skips.pop()
            x = strided_bn_act(x, pp, "up_conv", "up_bn", "up_act", ss,
                               transpose=True)
            x = jnp.concatenate([x, skip.astype(dtype)], axis=-1)
            x = res_block(x, pp["res"], ss["res"], nconv)
            c //= 2
        pp, ss = p["out_block"], s["out_block"]
        x = conv_bn_act(x, pp["conv"], ss["conv"], site="head")
        logits = _xla_conv(x, pp["proj"]["kernel"], pp["proj"]["bias"])
        if return_logits:
            return logits
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return apply_fn

