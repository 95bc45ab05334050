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

``build_fused_forward(net, variables)`` returns ``(apply_fn, fused_vars)``:
``apply_fn(fused_vars, x, train=False)`` computes the same function as
``net.apply(variables, x, train=False)`` (within bf16 tolerance). The
folded + pre-packed kernels live in ``fused_vars`` — a flat numpy pytree
passed as a JIT ARGUMENT, not captured as closure constants. Embedding them
as constants made the sliding-window HLO ~190 MB (the 64x512^2 program):
hashing/serializing it dominated first-case latency (~2 min per new
inferer over the remote-compile link), the persistent compile cache keyed
on the weight VALUES (new checkpoint = full recompile), and tracing paid
for P*3 scatter ops per conv site. As arguments, the program is a few KB
of HLO and one compiled executable serves every checkpoint of the same
architecture. Drop-in for ``SlidingWindowInferer(apply_fn=..,
apply_vars=..)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.ops.pallas_conv import (thin_conv3d,
    fold_bn_np as fold_bn)
from segmentation3d_tpu.ops.packed_conv import (
    packed_conv3d_pre, window_conv3d_pre, pack_kernel_np, window_kernels_np,
    deconv2x, pick_p, pick_window_p)

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


def _xla_conv(x, w, b, strides=(1, 1, 1), padding="SAME", dtype=jnp.bfloat16,
              accum="f32"):
    if accum == "bf16" and dtype == jnp.bfloat16:
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), strides, padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    else:
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), strides, padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape(1, 1, 1, 1, -1).astype(out.dtype)
    return out


def build_fused_forward(net: SegmentationNet, variables, dtype=jnp.bfloat16,
                        use_pallas: bool | None = None, interpret: bool = False,
                        pallas_sites: frozenset | None = None,
                        packed_sites: frozenset | None = None,
                        window_sites: frozenset | None = None,
                        use_deconv2x: bool = False,
                        wide_xy: bool = False,
                        window_couts: tuple | None = None,
                        accum: str | None = None):
    """Two-phase build. Phase 1 (here, host numpy): fold BN into every conv,
    decide each site's lowering route (measured defaults below), and
    pre-pack window/packed kernels. Phase 2 (the returned ``apply_fn``,
    traced): consume the prebuilt arrays from the ``fused_vars`` argument.

    Measured routing defaults (benchmarks/bench_convs.py, TPU v5e, bf16,
    64x512^2 slab planes): thin stride-1 3^3 convs -> window-GEMM conv
    (stem 12.5->8.8 ms vs packed, res16 25.2->17.2, up32res 45.3->33.0).
    ``pallas_sites``/``use_pallas`` widen the Pallas routing for experiments;
    on non-TPU backends Pallas is skipped (Mosaic kernels don't lower there).
    """
    # ``accum="bf16"`` (the default under bf16): convs emit bf16 directly —
    # the flax forward's own output precision, argmax-parity with the f32
    # accumulation (same change as build_packed_forward; BASELINE round-3).
    if accum is None:
        accum = "bf16" if dtype == jnp.bfloat16 else "f32"
    if accum not in ("f32", "bf16"):
        raise ValueError(f"accum {accum!r} is not one of 'f32', 'bf16'")
    if accum == "bf16" and dtype != jnp.bfloat16:
        raise ValueError("accum='bf16' requires dtype=jnp.bfloat16")
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

    fv = {}    # flat key -> dict of numpy arrays (the jit-argument pytree)
    meta = {}  # flat key -> static routing info captured by the closure

    def folded_np(pp, ss):
        w, b = fold_bn(pp["conv"]["kernel"],
                       pp["conv"].get("bias"),
                       pp["bn"]["scale"], pp["bn"]["bias"],
                       ss["bn"]["mean"], ss["bn"]["var"])
        return np.asarray(w, np.float32), np.asarray(b, np.float32)

    def alpha_of(pp, name):
        if act_kind == "prelu" and name in pp:
            import numpy as _np
            return float(_np.asarray(pp[name]["alpha"]).reshape(())[()])
        return 0.25

    # ---- phase 1: register each conv site -------------------------------
    def reg_conv(key, pp, ss, act=True, pname="act", site="res",
                 residual=None):
        w, b = folded_np(pp, ss)
        cin, cout = int(w.shape[3]), int(w.shape[4])
        kind = act_kind if act else "none"
        m = {"act": kind, "alpha": alpha_of(pp, pname), "cout": cout,
             "residual": residual}
        if (site in pallas_sites and w.shape[:3] == (3, 3, 3)
                and cout <= PALLAS_COUT_MAX
                and (residual is None or cin == cout)):
            m["route"], m["res_alpha"] = "pallas", (residual or {}).get("alpha")
            fv[key] = {"w": w, "b": b}
        elif (site in window_sites and w.shape[:3] == (3, 3, 3)
                and pick_window_p(cout) > 1
                and (window_couts is None or cout in window_couts)):
            P = pick_window_p(cout)
            mid, wl, wr = window_kernels_np(w, P)
            m["route"], m["P"] = "window", P
            fv[key] = {"mid": mid, "left": wl, "right": wr,
                       "b": np.tile(b, P)}
        elif (site in packed_sites and w.shape[:3] == (3, 3, 3)
                and pick_p(cin, cout) > 1):
            P = pick_p(cin, cout)
            m["route"], m["P"] = "packed", P
            fv[key] = {"wk": pack_kernel_np(w, P), "b": np.tile(b, P)}
        else:
            m["route"] = "xla"
            fv[key] = {"w": w, "b": b}
        meta[key] = m

    def reg_strided(key, pp, conv_name, bn_name, act_name, ss, transpose):
        w, b = fold_bn(pp[conv_name]["kernel"], pp[conv_name].get("bias"),
                       pp[bn_name]["scale"], pp[bn_name]["bias"],
                       ss[bn_name]["mean"], ss[bn_name]["var"])
        fv[key] = {"w": np.asarray(w, np.float32),
                   "b": np.asarray(b, np.float32)}
        meta[key] = {"transpose": transpose, "alpha": alpha_of(pp, act_name)}

    def reg_res_block(key, pp, ss, num_convs, site="res"):
        residual = None
        if num_convs == 1 and "res" in pallas_sites:
            # single-conv residual blocks (all the thin ones in this V-Net)
            # can fuse ENTIRELY into one Pallas pass: conv+bn+act+add+act_out
            residual = {"alpha": alpha_of(pp, "act_out")}
        for i in range(num_convs):
            reg_conv(f"{key}/conv{i}", pp[f"conv{i}"], ss[f"conv{i}"],
                     act=True, site=site,
                     residual=residual if num_convs == 1 else None)
        meta[key] = {"n": num_convs, "alpha_out": alpha_of(pp, "act_out")}

    down_convs = list(net.down_convs)
    up_convs = list(net.up_convs)
    base = net.base_channels

    reg_conv("in_block/conv", p["in_block"]["conv"], s["in_block"]["conv"],
             site="stem")
    c = base
    for nconv in down_convs:
        c *= 2
        pp, ss = p[f"down_{c}"], s[f"down_{c}"]
        reg_strided(f"down_{c}/down", pp, "down_conv", "down_bn", "down_act",
                    ss, transpose=False)
        reg_res_block(f"down_{c}/res", pp["res"], ss["res"], nconv)
    for nconv in up_convs:
        pp, ss = p[f"up_{c}"], s[f"up_{c}"]
        reg_strided(f"up_{c}/up", pp, "up_conv", "up_bn", "up_act",
                    ss, transpose=True)
        reg_res_block(f"up_{c}/res", pp["res"], ss["res"], nconv)
        c //= 2
    reg_conv("out_block/conv", p["out_block"]["conv"], s["out_block"]["conv"],
             site="head")
    fv["out_block/proj"] = {
        "w": np.asarray(p["out_block"]["proj"]["kernel"], np.float32),
        "b": np.asarray(p["out_block"]["proj"]["bias"], np.float32)}

    # ---- phase 2: the traced forward ------------------------------------
    def run_conv(key, v, x, x_res=None):
        m = meta[key]
        kind, alpha, cout = m["act"], m["alpha"], m["cout"]
        if m["route"] == "pallas":
            if x.shape[3] >= 8:  # Mosaic kernel needs >= 8 x-positions
                if x_res is not None:
                    return thin_conv3d(x.astype(dtype), v["w"], v["b"],
                                       act=kind, alpha=alpha, out_dtype=dtype,
                                       interpret=interpret, residual=act_kind,
                                       res_alpha=m["res_alpha"])
                return thin_conv3d(x.astype(dtype), v["w"], v["b"], act=kind,
                                   alpha=alpha, out_dtype=dtype,
                                   interpret=interpret)
            # thin-width fallback: XLA conv (fv holds the plain folded w/b for
            # the pallas route), replicating conv+act and the fused residual
            out = _xla_conv(x, v["w"], v["b"], dtype=dtype, accum=accum)
            out = _act(out, kind, alpha).astype(dtype)
            if x_res is not None:
                out = _act(x_res + out, act_kind, m["res_alpha"]).astype(dtype)
            return out
        conv_out = dtype if accum == "bf16" else jnp.float32
        if m["route"] == "window":
            out = window_conv3d_pre(x.astype(dtype), v["mid"], v["left"],
                                    v["right"], v["b"], P=m["P"], cout=cout,
                                    out_dtype=conv_out, accum=accum)
        elif m["route"] == "packed":
            out = packed_conv3d_pre(x.astype(dtype), v["wk"], v["b"],
                                    P=m["P"], cout=cout,
                                    out_dtype=conv_out, accum=accum)
        else:
            out = _xla_conv(x, v["w"], v["b"], dtype=dtype, accum=accum)
        return _act(out, kind, alpha).astype(dtype)

    def run_strided(key, v, x):
        m = meta[key]
        if m["transpose"] and use_deconv2x:
            # k=2/s=2 deconv == pixel-shuffle GEMM. Isolated it beats the
            # direct conv_transpose lowering, but IN-NET the interleave
            # transpose breaks fusion with the following concat+res conv:
            # 235 vs 204 ms/slab-fwd measured — opt-in variant.
            out = deconv2x(x.astype(dtype), v["w"], v["b"],
                           out_dtype=jnp.float32)
        elif m["transpose"]:
            if accum == "bf16":
                out = jax.lax.conv_transpose(
                    x.astype(dtype), v["w"].astype(dtype), (2, 2, 2), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            else:
                out = jax.lax.conv_transpose(
                    x.astype(dtype), v["w"].astype(dtype), (2, 2, 2), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
            out = out + v["b"].reshape(1, 1, 1, 1, -1).astype(out.dtype)
        else:
            out = _xla_conv(x, v["w"], v["b"], strides=(2, 2, 2),
                            padding="VALID", dtype=dtype, accum=accum)
        return _act(out, act_kind, m["alpha"]).astype(dtype)

    def run_res_block(key, fvars, x):
        m = meta[key]
        if m["n"] == 1 and meta[f"{key}/conv0"]["route"] == "pallas" \
                and meta[f"{key}/conv0"]["residual"] is not None:
            return run_conv(f"{key}/conv0", fvars[f"{key}/conv0"], x, x_res=x)
        h = x
        for i in range(m["n"]):
            h = run_conv(f"{key}/conv{i}", fvars[f"{key}/conv{i}"], h)
        return _act(x + h, act_kind, m["alpha_out"]).astype(dtype)

    def apply_fn(fvars, x, train=False, return_logits=False):
        del train
        x = x.astype(dtype)
        c = base
        skips = []
        x = run_conv("in_block/conv", fvars["in_block/conv"], x)
        skips.append(x)
        n = len(down_convs)
        for i, _ in enumerate(down_convs):
            c *= 2
            x = run_strided(f"down_{c}/down", fvars[f"down_{c}/down"], x)
            x = run_res_block(f"down_{c}/res", fvars, x)
            if i + 1 < n:
                skips.append(x)
        for _ in up_convs:
            skip = skips.pop()
            x = run_strided(f"up_{c}/up", fvars[f"up_{c}/up"], x)
            x = jnp.concatenate([x, skip.astype(dtype)], axis=-1)
            x = run_res_block(f"up_{c}/res", fvars, x)
            c //= 2
        x = run_conv("out_block/conv", fvars["out_block/conv"], x)
        v = fvars["out_block/proj"]
        logits = _xla_conv(x, v["w"], v["b"], dtype=dtype)
        if return_logits:
            return logits
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return apply_fn, fv
