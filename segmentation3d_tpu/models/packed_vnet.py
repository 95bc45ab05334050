"""Packed-domain fused V-Net inference forward.

``models/fused_vnet.py`` routes individual thin convs through the
window-GEMM lowering, but every surrounding op (stride-2 down convs,
deconvs, concats, residual adds) still sees the UNPACKED [.., W, C] form
with thin C — so XLA assigns those ops H-minor layouts and inserts
full-volume layout copies at every boundary. Profiling one 512^3 slab
volume (jax.profiler trace, TPU v5e): ~350 ms/volume of pure ``copy``
"data formatting" ops + a 29 ms/slab pad fusion for the skip concat.

This module keeps the ENTIRE forward in the packed channels-minor form
``[B, D, H, cols, P*C]`` with ``P*C`` pinned near 128 lanes at every
level, so no op ever prefers an H-minor layout:

- stride-1 3^3 convs: window-GEMM (``ops.packed_conv.window_conv_packed``);
- k=2/s=2 down convs: ONE packed conv, stride (2,2,1) over (z,y,cols) —
  both taps of an output live in the same packed column, no halos
  (``down_kernel_np``);
- k=2/s=2 deconvs: a pure GEMM — the x-interleave is a free channel-block
  reinterpretation in packed form; only the z/y unshuffle (contiguous
  128-lane block transpose) remains (``deconv_gemm_np``);
- skip concats: packed-channel interleave (one bandwidth pass);
- head 3^3 conv: repacked (free reshape) to P=32; 1x1 proj: block-diagonal
  GEMM; softmax over per-voxel class pairs in packed channels.

Every P-change between levels is a FREE reshape: the packed layout's
linear memory order is exactly the unpacked (x, c) order for any P.

Same two-phase structure and ``(apply_fn, fused_vars)`` interface as
``build_fused_forward`` (folded numpy kernels passed as jit arguments).
Constraints: W % P0 == 0 (the in_block packing, 8 for base 16 — every
max_stride-legal W qualifies) with the head packing chosen at build time
(``head_p``, default 32 — pass ``head_p_for(W, nc)`` for other widths),
D/H/W % max_stride == 0, standard (non-bottleneck) blocks — the caller
falls back to ``build_fused_forward`` otherwise. Forward-only (inference); cites reference
``segmentation3d/network/vnet.py:SegmentationNet.forward`` (SURVEY §3.3)
for the computed function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.ops.pallas_conv import fold_bn_np as fold_bn
from segmentation3d_tpu.ops.packed_conv import (
    window_kernels_np, window_conv_packed, down_kernel_np, down_conv_packed,
    deconv_gemm_np, deconv_gemm_apply, deconv_unshuffle, concat_packed,
    interleave_perm_np, pick_window_p, _conv_acc, block_sigma_np,
    sigma_expand_np, block_plan, window_conv_packed_block)
from segmentation3d_tpu.ops.quant import (
    quantize_weight_np, conv_i8, requant, window_conv_packed_i8,
    down_conv_packed_i8, deconv_gemm_apply_i8, concat_packed_i8,
    window_conv_packed_block_i8)


def _p_for(c: int) -> int:
    """Canonical packing: largest power-of-2 P with P*C <= 128 (>= 1)."""
    p = 1
    while 2 * p * c <= 128:
        p *= 2
    return p


def _act(x, kind, alpha=0.25):
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "prelu":
        return jnp.where(x >= 0, x, alpha * x)
    if kind == "none":
        return x
    raise ValueError(kind)


def build_packed_forward(net: SegmentationNet, variables, dtype=jnp.bfloat16,
                         accum: str | None = None,
                         head_p: int | None = None,
                         quant: str | None = None,
                         act_clip: float = 8.0,
                         calib: dict | None = None,
                         calib_margin: float = 1.2,
                         stats: bool = False,
                         pallas_halo: bool | None = None,
                         concat_fold: bool | None = None):
    """Returns ``(apply_fn, fused_vars)``; ``apply_fn(fused_vars, x)`` ==
    ``net.apply(variables, x, train=False)`` within bf16 tolerance.

    ``accum="bf16"`` (bf16 ``dtype`` only; the default under bf16):
    every conv emits bf16 directly instead of materializing an f32
    accumulation that the following bias+act+cast pass re-reads
    (``ops.packed_conv._conv_acc``). This is the flax reference forward's
    own output precision (flax convs under ``dtype=bf16`` emit bf16), so
    argmax parity holds; the softmax head still computes in f32.
    Measured 68.7 -> 71.0 volumes/min on the 512^3 headline
    (BASELINE.md round-3).

    ``head_p``: the head packing (the block-diagonal proj kernel is
    prebuilt with numpy, so it is a BUILD-time choice). Default
    ``pick_window_p(nc)`` = 32; pass ``head_p_for(W, nc)`` for patch
    widths where 32 does not divide W (48, 80, 112, ... — every
    max_stride-legal width packs at >= 16).

    ``quant="int8"`` (opt-in): every conv between the stem and the softmax
    runs int8 x int8 -> int32 on the 2x MXU path, and every activation
    tensor is int8 (HALF the HBM bytes of each elementwise pass, slice,
    halo, unshuffle and skip buffer). Weights are per-output-channel
    symmetric int8 (exact maxima of the BN-folded kernels); activations
    use STATIC per-site scales, which is what lets every
    dequant+bias+act+requant chain fuse into its conv's output fusion (a
    dynamic amax scale would add two full-tensor HBM passes per conv —
    see ``ops/quant.py``). Scale source, in preference order:

    - ``calib``: a per-site activation-maxima dict from
      :func:`calibrate_int8` (run the full-precision forward on sample
      patches once); each site gets ``amax * calib_margin / 127``. Skip
      and deconv sites feeding the same concat are unified to their max
      (their int8 tensors concatenate, so they must share a scale).
    - otherwise ``act_clip/127`` globally — sound uncalibrated because BN
      folding standardizes every conv output against training statistics,
      so post-activation values live in a known O(1) range (8 sigma
      default saturation).

    The residual identity and the chain's last conv output meet in f32
    INSIDE the last conv's fusion (no extra pass, no double quantization).
    The stem (reads the bf16 input patch) and the softmax head (f32) keep
    full precision. Accuracy is model-dependent: validate with
    ``seg_eval`` / ``tests/test_quant.py``-style argmax-agreement checks.

    ``stats=True`` (full-precision builds only): ``apply_fn`` returns
    ``(probs, {site: activation_amax})`` — the measurement side of
    :func:`calibrate_int8`."""
    if net.bottleneck:
        raise NotImplementedError("packed forward supports the standard "
                                  "(non-bottleneck) V-Net blocks")
    if accum is None:
        accum = "bf16" if dtype == jnp.bfloat16 else "f32"
    if accum not in ("f32", "bf16"):
        raise ValueError(f"accum {accum!r} is not one of 'f32', 'bf16'")
    if accum == "bf16" and dtype != jnp.bfloat16:
        raise ValueError("accum='bf16' requires dtype=jnp.bfloat16")
    if quant not in (None, "int8"):
        raise ValueError(f"quant {quant!r} is not one of None, 'int8'")
    q8 = quant == "int8"
    if stats and q8:
        raise ValueError("stats=True measures the full-precision forward; "
                         "it cannot be combined with quant")
    # round-4: optional routing of int8 cin==cout window sites through the
    # Pallas in-kernel-halo kernel (ops/pallas_i8win.py). ISOLATED per-site
    # chains win at every geometry (dn32 5.07 -> 3.65 ms/conv, up32 23.1 ->
    # 19.7 — bench_i8win.py, exact parity), but IN-NET the 512^3 headline
    # measured 98 -> 37 volumes/min with every site routed: the kernel's
    # host-side pad + overlapping-row gather add ~2 full-tensor copies per
    # conv, and inside the big slab program (live skip buffers + blend
    # accumulators) that pushes XLA into a far worse schedule. Default OFF
    # (counter-result recorded in BASELINE.md); opt in per build with
    # pallas_halo=True or SEG3D_PALLAS_HALO=1 for kernel work.
    if pallas_halo is None:
        import os as _os
        pallas_halo = (q8 and jax.default_backend() == "tpu"
                       and _os.environ.get("SEG3D_PALLAS_HALO", "0") == "1")
    use_ph = bool(pallas_halo) and q8 and jax.default_backend() != "cpu"
    # round-5 (VERDICT round-4 next #3): fold the LAST decoder level's skip-
    # concat interleave permutation into its consumer kernels' K/N dims
    # (ops.packed_conv.block_sigma_np) — the concat stays in cheap block
    # order, so the perm GEMM (and on int8 its extra requant pass, the
    # 24+6.6+3.8 ms/slab round-4 trace bucket at up32) disappears. int8 is
    # BIT-exact vs the perm form (int32 accumulation). Opt-in via
    # concat_fold=True / SEG3D_CONCAT_FOLD=1 until the headline A/B lands.
    if concat_fold is None:
        import os as _os
        concat_fold = _os.environ.get("SEG3D_CONCAT_FOLD", "0") == "1"
    concat_fold = bool(concat_fold)
    p = variables["params"]
    s = variables["batch_stats"]
    act_kind = net.act
    nc = net.out_channels

    base = net.base_channels
    down_convs = list(net.down_convs)
    up_convs = list(net.up_convs)

    # ---- activation-site graph + static scales (quant / stats) ----------
    # Every activation tensor in the forward has a site key; sites_in maps
    # each site to the site that PRODUCES its input (None for the stem).
    sites_in = {"in_block/conv": None}
    enc_sites = ["in_block/conv"]     # skip producers, in encoder order
    unify_pairs = []                  # (deconv site, skip site) per concat
    prev = "in_block/conv"
    cc = base
    for nconv in down_convs:
        cc *= 2
        dk = f"down_{cc}/down"
        sites_in[dk] = prev
        rk = f"down_{cc}/res"
        rin = dk
        for j in range(nconv):
            ck = f"{rk}/conv{j}"
            sites_in[ck] = rin
            rin = ck
        sites_in[rk] = dk             # the res ADD's identity input
        enc_sites.append(rk)
        prev = rk
    enc_sites.pop()                   # the bottleneck res is not a skip
    for nconv in up_convs:
        uk = f"up_{cc}/up"
        sites_in[uk] = prev
        unify_pairs.append((uk, enc_sites.pop()))
        rk = f"up_{cc}/res"
        rin = uk                      # concat scale == unified up/skip scale
        for j in range(nconv):
            ck = f"{rk}/conv{j}"
            sites_in[ck] = rin
            rin = ck
        sites_in[rk] = uk
        prev = rk
        cc //= 2
    sites_in["out_block/conv"] = prev

    def _site_scale(k):
        if calib is None:
            return float(act_clip) / 127.0
        if k not in calib:
            raise ValueError(f"calib dict is missing activation site {k!r} "
                             "(use calibrate_int8 to produce it)")
        return max(float(calib[k]), 1e-6) * float(calib_margin) / 127.0

    s_out = {k: _site_scale(k) for k in sites_in}
    for uk, sk in unify_pairs:        # concatenated int8 tensors share scale
        m = max(s_out[uk], s_out[sk])
        s_out[uk] = s_out[sk] = m

    fv = {}    # flat key -> numpy arrays (jit-argument pytree)
    meta = {}  # flat key -> static info

    def folded_np(pp, ss, conv="conv", bn="bn"):
        w, b = fold_bn(pp[conv]["kernel"], pp[conv].get("bias"),
                       pp[bn]["scale"], pp[bn]["bias"],
                       ss[bn]["mean"], ss[bn]["var"])
        return np.asarray(w, np.float32), np.asarray(b, np.float32)

    def alpha_of(pp, name):
        if act_kind == "prelu" and name in pp:
            import numpy as _np
            return float(_np.asarray(pp[name]["alpha"]).reshape(())[()])
        return 0.25

    # ---- phase 1: fold + pack every site --------------------------------
    def reg_win(key, pp, ss, P, cin, q=None, fold_sigma=None,
                fold_out=False):
        """Stride-1 3^3 conv at packing P (window kernels; P=1 -> direct).
        ``q``: quantize this site (default: the build's quant mode; the
        stem passes False — its input is the unquantized bf16 patch).
        ``fold_sigma``: this site consumes a BLOCK-order concat — gather
        the mid kernel's input lanes by sigma (``fold_out`` additionally
        relabels the OUTPUT lanes to block order, for the residual add
        against the block identity)."""
        q = q8 if q is None else q
        w, b = folded_np(pp, ss)
        cout = int(w.shape[-1])
        m = {"P": P, "cin": cin, "cout": cout, "alpha": alpha_of(pp, "act"),
             "q": q}
        if q8:
            m["inv_out"] = 1.0 / s_out[key]   # requant scale of THIS site
        if q:
            wq, sw = quantize_weight_np(w)
            w = wq
        if P > 1:
            mid, wl, wr = window_kernels_np(w, P)
            if fold_sigma is not None:
                mid = mid.take(fold_sigma, axis=3)
                bv = np.tile(b, P)
                if fold_out:
                    mid = mid.take(fold_sigma, axis=4)
                    bv = bv[fold_sigma]
                fv[key] = {"mid": mid, "left": wl, "right": wr, "b": bv}
                m["route"] = "window_block"
                m["plan"] = block_plan(fold_sigma, P, cin, cout, fold_out)
            elif q and use_ph and cin == cout:
                from segmentation3d_tpu.ops.pallas_i8win import (
                    mid9_np, halo9_np)
                fv[key] = {"w9": mid9_np(mid), "wl9": halo9_np(wl),
                           "wr9": halo9_np(wr), "b": np.tile(b, P),
                           "al": np.full(P * cout, m["alpha"], np.float32)}
                m["route"] = "pallas_win"
            else:
                fv[key] = {"mid": mid, "left": wl, "right": wr,
                           "b": np.tile(b, P)}
                m["route"] = "window"
        else:
            assert fold_sigma is None, "lane fold needs a packed (P>1) site"
            fv[key] = {"w": w, "b": b}
            m["route"] = "direct"
        if q:
            # dequant multiplier = input site's scale x per-channel w scale
            sv = np.tile(sw * np.float32(s_out[sites_in[key]]), P)
            if fold_sigma is not None and fold_out:
                sv = sv[fold_sigma]
            fv[key]["s"] = sv
        meta[key] = m

    def reg_res(key, pp, ss, num_convs, P, cin, fold_sigma=None):
        assert fold_sigma is None or num_convs == 1, \
            "concat fold is built for single-conv res chains"
        for i in range(num_convs):
            reg_win(f"{key}/conv{i}", pp[f"conv{i}"], ss[f"conv{i}"],
                    P, cin if i == 0 else meta[f"{key}/conv0"]["cout"],
                    fold_sigma=fold_sigma if i == 0 else None,
                    fold_out=fold_sigma is not None)
        meta[key] = {"n": num_convs, "alpha_out": alpha_of(pp, "act_out")}
        if q8:
            meta[key]["s_id"] = s_out[sites_in[key]]  # identity input scale
            meta[key]["inv_out"] = 1.0 / s_out[key]

    # stem: stays bf16 (its input is the unquantized patch); under quant
    # its epilogue emits int8 (requant fused into the same conv fusion)
    P0 = _p_for(base)                       # 8 for base 16
    reg_win("in_block/conv", p["in_block"]["conv"], s["in_block"]["conv"],
            P0, net.in_channels, q=False)
    # encoder
    c, P = base, P0
    enc = []                                # (channels, P) per skip level
    for i, nconv in enumerate(down_convs):
        enc.append((c, P))
        c *= 2
        pp, ss = p[f"down_{c}"], s[f"down_{c}"]
        w, b = folded_np(pp, ss, "down_conv", "down_bn")
        key = f"down_{c}/down"
        if q8:
            w, sw = quantize_weight_np(w)
        if P > 1:
            fv[key] = {"k": down_kernel_np(w, P), "b": np.tile(b, P // 2)}
            meta[key] = {"route": "packed", "P": P, "cout": c,
                         "alpha": alpha_of(pp, "down_act")}
            if q8:
                fv[key]["s"] = np.tile(
                    sw * np.float32(s_out[sites_in[key]]), P // 2)
        else:
            fv[key] = {"w": w, "b": b}
            meta[key] = {"route": "direct", "P": 1, "cout": c,
                         "alpha": alpha_of(pp, "down_act")}
            if q8:
                fv[key]["s"] = sw * np.float32(s_out[sites_in[key]])
        if q8:
            meta[key]["inv_out"] = 1.0 / s_out[key]
        P = max(P // 2, 1)
        reg_res(f"down_{c}/res", pp["res"], ss["res"], nconv, P, c)
    # head packing is needed BEFORE the decoder: the concat fold's lane
    # relabeling must extend into the head conv's (repacked) input lanes
    Ph = int(head_p) if head_p is not None else pick_window_p(nc)
    assert Ph >= 1 and (Ph & (Ph - 1)) == 0, f"head_p {Ph} not a power of 2"
    head_sigma = None
    # decoder
    for nconv in up_convs:
        pp, ss = p[f"up_{c}"], s[f"up_{c}"]
        up = c // 2
        w, b = folded_np(pp, ss, "up_conv", "up_bn")   # [2,2,2, c_in, up]
        key = f"up_{c}/up"
        skip_c, skip_P = enc.pop()
        # lane-relabeling fold site: the LAST decoder level (single-conv
        # res chain; its output feeds only the head, whose kernels can
        # absorb the relabeling after the free repack)
        fold_this = (concat_fold and c == 2 * base and nconv == 1
                     and skip_P > 1 and up == skip_c
                     and Ph >= skip_P and Ph % skip_P == 0)
        if q8:
            w, sw = quantize_weight_np(w)
        fv[key] = {"k": deconv_gemm_np(w, P), "b": b}
        if q8:
            # deconv_gemm output channel order (dz, dy, x-block, cout):
            # prebuild the full lane-scale/bias vectors once in numpy
            fv[key]["s"] = np.tile(
                sw * np.float32(s_out[sites_in[key]]), 4 * 2 * P)
            fv[key]["b"] = np.tile(b, 4 * 2 * P)
        if skip_P > 1 and not fold_this:
            perm = interleave_perm_np(skip_P, up, skip_c)
            fv[key]["perm"] = perm.astype(np.int8) if q8 else perm
        # NOTE: the res block stays at the SKIP's packing. Repacking to the
        # minimal P for its channel count (e.g. 8 -> 4 at the full-res
        # 32-channel level, window inflation (P+2)/3: 3.33x -> 2x) was
        # measured WORSE (54.1 -> 48.0 volumes/min on the 512^3 headline):
        # the -94 ms/volume of conv FLOPs came back as +246 ms of layout
        # copies — XLA assigns different layouts to the two P-views, so the
        # "free" reshape materializes at every level boundary.
        meta[key] = {"P": P, "P_out": 2 * P, "cout": up,
                     "alpha": alpha_of(pp, "up_act"),
                     "skip_c": skip_c, "skip_P": skip_P, "P_res": skip_P,
                     "fold": fold_this}
        if q8:
            meta[key]["inv_out"] = 1.0 / s_out[key]
        P = skip_P
        sigma = None
        if fold_this:
            sigma = block_sigma_np(skip_P, up, skip_c)
            head_sigma = sigma_expand_np(sigma, Ph // skip_P)
        reg_res(f"up_{c}/res", pp["res"], ss["res"], nconv, P, c,
                fold_sigma=sigma)
        c //= 2
    # head: repack to the window head packing
    reg_win("out_block/conv", p["out_block"]["conv"], s["out_block"]["conv"],
            Ph, 2 * base, fold_sigma=head_sigma)
    # 1x1 proj as a block-diagonal GEMM over packed channels
    wproj = np.asarray(p["out_block"]["proj"]["kernel"], np.float32)  # [1,1,1,nc,nc]
    bproj = np.asarray(p["out_block"]["proj"]["bias"], np.float32)
    bd = np.zeros((1, 1, 1, Ph * nc, Ph * nc), np.float32)
    for xo in range(Ph):
        bd[0, 0, 0, xo * nc:(xo + 1) * nc, xo * nc:(xo + 1) * nc] = \
            wproj[0, 0, 0]
    fv["out_block/proj"] = {"k": bd, "b": np.tile(bproj, Ph)}
    meta["out_block"] = {"Ph": Ph}

    if dtype == jnp.bfloat16:
        # pre-cast the BIG kernel arrays to bf16 on host: the traced ops
        # cast them to the bf16 compute dtype anyway (same rounding), and
        # halving the folded-var bytes halves the per-save-point re-staging
        # upload of the validation refold (~76 -> ~40 MB; the slow-relay
        # H2D was ~2.5 s of a 12 s save point, round-5 attribution) and
        # every session build's first upload. Epilogue vectors (b, s) stay
        # f32 — they participate in f32 math.
        import ml_dtypes
        for site in fv.values():
            for name in ("mid", "left", "right", "k", "w"):
                arr = site.get(name)
                if arr is not None and arr.dtype == np.float32:
                    site[name] = arr.astype(ml_dtypes.bfloat16)

    # ---- phase 2: the traced forward ------------------------------------
    def lane(v):  # [C'] -> broadcastable over [B,D,H,cols,C']
        return v.reshape(1, 1, 1, 1, -1)

    def run_win(key, v, xp, out="dtype", st=None):
        """``out``: "dtype" (bf16/f32 cast), "int8" (requant at this site's
        static scale — elementwise, fused into this conv's own output
        fusion, never a standalone HBM pass), or "raw" (the f32/compute
        activation, for the residual add to consume inside the same
        fusion). ``st``: stats collector (full-precision builds)."""
        m = meta[key]
        if m.get("q"):
            if m["route"] == "pallas_win":
                # ONE kernel: mid + halo GEMMs + dequant/bias/act/requant on
                # the resident VMEM tile — no halo s32 ever hits HBM
                from segmentation3d_tpu.ops.pallas_i8win import (
                    window_conv_i8_pallas)
                y = window_conv_i8_pallas(
                    xp, v["w9"], v["wl9"], v["wr9"], v["s"], v["b"], v["al"],
                    P=m["P"], cin=m["cin"], cout=m["cout"], act=act_kind,
                    inv_sa=m["inv_out"], out_int8=(out == "int8"))
                if out == "int8":
                    return y
                # "raw": bf16 activation — meets the f32 identity add by
                # promotion (noise well below the int8 quantization step)
                return y if out == "raw" else y.astype(dtype)
            if m["route"] == "window_block":
                y = window_conv_packed_block_i8(xp, v["mid"], v["left"],
                                                v["right"], plan=m["plan"])
            elif m["route"] == "window":
                # NOTE (round-3 counter-result): do NOT pass deq_scale here.
                # XLA already fuses the ENTIRE dequant+bias+act+requant
                # epilogue into the mid conv (the trace's clamp_convert
                # fusions carry the conv kernel as an operand; the halo s32
                # outputs ride in as extra operands). Forcing per-conv bf16
                # dequant un-fuses the halo outputs into standalone
                # multiply_convert passes: headline 97.3 -> 91.1 vol/min.
                y = window_conv_packed_i8(xp, v["mid"], v["left"], v["right"],
                                          P=m["P"], cin=m["cin"])
            else:  # P == 1: plain SAME conv on the (identical) unpacked view
                y = conv_i8(xp, v["w"], (1, 1, 1),
                            ((1, 1), (1, 1), (1, 1)))
            a = y.astype(jnp.float32) * lane(v["s"]) + lane(v["b"])
            a = _act(a, act_kind, m["alpha"])
        else:
            if m["route"] == "window_block":
                a = window_conv_packed_block(xp, v["mid"], v["left"],
                                             v["right"], v["b"],
                                             plan=m["plan"], accum=accum)
            elif m["route"] == "window":
                a = window_conv_packed(xp, v["mid"], v["left"], v["right"],
                                       v["b"], P=m["P"], cin=m["cin"],
                                       accum=accum)
            else:
                a = _conv_acc(xp.astype(dtype), v["w"].astype(dtype),
                              (1, 1, 1), "SAME", ("NDHWC", "DHWIO", "NDHWC"),
                              False, accum)
                a = a + v["b"].astype(a.dtype).reshape(1, 1, 1, 1, -1)
            a = _act(a, act_kind, m["alpha"])
        if st is not None:
            st[key] = jnp.max(jnp.abs(a)).astype(jnp.float32)
        if out == "int8":
            return requant(a.astype(jnp.float32), m["inv_out"])
        if out == "raw":
            return a
        return a.astype(dtype)

    def run_res(key, fvars, xp, st=None):
        """Quant builds: ``xp`` is int8; inner convs emit int8 at their own
        site scales, the LAST conv's activation stays f32 inside its fusion
        and meets the dequantized identity there (one fused epilogue — no
        double quantization of the chain output)."""
        m = meta[key]
        h = xp
        for i in range(m["n"]):
            last = i == m["n"] - 1
            h = run_win(f"{key}/conv{i}", fvars[f"{key}/conv{i}"], h,
                        out=("raw" if last else "int8") if q8 else "dtype",
                        st=st)
        if q8:
            a = _act(xp.astype(jnp.float32) * jnp.float32(m["s_id"]) + h,
                     act_kind, m["alpha_out"])
            return requant(a, m["inv_out"])
        a = _act(xp + h, act_kind, m["alpha_out"])
        if st is not None:
            st[key] = jnp.max(jnp.abs(a)).astype(jnp.float32)
        return a.astype(dtype)

    def repack(x, P_from, P_to):
        """Free reshape between packings (same linear memory order)."""
        if P_from == P_to:
            return x
        B, D, H, cols, ch = x.shape
        c = ch // P_from
        W = cols * P_from
        return x.reshape(B, D, H, W // P_to, P_to * c)

    def apply_fn(fvars, x, train=False, return_logits=False,
                 return_packed=False):
        """``return_packed=True`` returns probabilities still in the packed
        head form [B, D, H, W/Ph, Ph*NC] (same memory as the unpacked
        result — the caller's blend tail can stay in full-lane layouts;
        see ``apply_fn.packed_head_p``)."""
        del train
        B, D, H, W, _ = x.shape
        assert W % P0 == 0, (
            f"packed forward requires W % {P0} == 0 (in_block packing)")
        assert W % Ph == 0, (
            f"W={W} is not divisible by the built head packing {Ph}; "
            f"rebuild with head_p=head_p_for(W, nc)")
        x = x.astype(dtype)
        st = {} if stats else None
        xp = x.reshape(B, D, H, W // P0, P0 * net.in_channels)
        xp = run_win("in_block/conv", fvars["in_block/conv"], xp,
                     out="int8" if q8 else "dtype", st=st)
        c, P = base, P0
        skips = []
        for i, _ in enumerate(down_convs):
            skips.append((xp, c, P))   # stem out + first n-1 res outputs
            c *= 2
            key = f"down_{c}/down"
            m, v = meta[key], fvars[key]
            if q8:
                if m["route"] == "packed":
                    y = down_conv_packed_i8(xp, v["k"])
                else:
                    y = conv_i8(xp, v["w"], (2, 2, 2),
                                ((0, 0), (0, 0), (0, 0)))
                a = y.astype(jnp.float32) * lane(v["s"]) + lane(v["b"])
                xp = requant(_act(a, act_kind, m["alpha"]), m["inv_out"])
            else:
                if m["route"] == "packed":
                    out = down_conv_packed(xp, v["k"], v["b"], accum=accum)
                else:
                    out = _conv_acc(xp.astype(dtype), v["w"].astype(dtype),
                                    (2, 2, 2), ((0, 0), (0, 0), (0, 0)),
                                    ("NDHWC", "DHWIO", "NDHWC"), False, accum)
                    out = out + v["b"].astype(out.dtype).reshape(1, 1, 1, 1, -1)
                out = _act(out, act_kind, m["alpha"])
                if st is not None:
                    st[key] = jnp.max(jnp.abs(out)).astype(jnp.float32)
                xp = out.astype(dtype)
            P = max(P // 2, 1)
            xp = run_res(f"down_{c}/res", fvars, xp, st=st)
        for _ in up_convs:
            key = f"up_{c}/up"
            m, v = meta[key], fvars[key]
            skip, skip_c, skip_P = skips.pop()
            if q8:
                # int8 GEMM -> fused dequant+act+requant ON THE RANK-5 GEMM
                # OUTPUT (reshape after, so the epilogue fuses into the
                # conv) -> int8 unshuffle (half the transpose bytes)
                y = deconv_gemm_apply_i8(xp, v["k"])
                a = y.astype(jnp.float32) * lane(v["s"]) + lane(v["b"])
                y = requant(_act(a, act_kind, m["alpha"]), m["inv_out"])
                Bq, Dq, Hq, colsq, _ = y.shape
                y = y.reshape(Bq, Dq, Hq, colsq, 2, 2,
                              m["P_out"] * m["cout"])
                up_act = deconv_unshuffle(y)
                up_act = repack(up_act, m["P_out"], skip_P)
                if m.get("fold"):
                    # block order: the interleave lives in the consumer
                    # kernels' lane relabeling — no perm GEMM, no requant
                    xp = jnp.concatenate([up_act, skip], axis=-1)
                else:
                    xp = concat_packed_i8(up_act, skip, m["cout"], skip_c,
                                          perm=v.get("perm"))
            else:
                # GEMM -> act+bf16 on the folded form -> z/y unshuffle (the
                # transpose then moves half the bytes)
                y = deconv_gemm_apply(xp, v["k"], v["b"], cout=m["cout"],
                                      P_out=m["P_out"], accum=accum)
                y = _act(y, act_kind, m["alpha"])
                if st is not None:
                    st[key] = jnp.max(jnp.abs(y)).astype(jnp.float32)
                y = y.astype(dtype)
                up_act = deconv_unshuffle(y)
                # align the up path to the skip's packing (free), then concat
                up_act = repack(up_act, m["P_out"], skip_P)
                if m.get("fold"):
                    xp = jnp.concatenate(
                        [up_act, skip.astype(up_act.dtype)], axis=-1)
                else:
                    xp = concat_packed(up_act, skip, m["cout"], skip_c,
                                       perm=v.get("perm"))
            xp = repack(xp, skip_P, m["P_res"])  # free: minimal-P res block
            P = m["P_res"]
            xp = run_res(f"up_{c}/res", fvars, xp, st=st)
            c //= 2
        # head at P=Ph (free repack from (P, 2*base))
        Ph_ = meta["out_block"]["Ph"]
        xp = repack(xp, P, Ph_)
        xp = run_win("out_block/conv", fvars["out_block/conv"], xp, st=st)
        v = fvars["out_block/proj"]
        # the 1x1 proj keeps f32 accumulation regardless of ``accum`` — its
        # output feeds the softmax directly and is tiny (Ph*NC channels)
        logits = _conv_acc(xp.astype(dtype), v["k"].astype(dtype), (1, 1, 1),
                           ((0, 0), (0, 0), (0, 0)),
                           ("NDHWC", "DHWIO", "NDHWC"), False, "f32")
        logits = logits + v["b"].astype(jnp.float32).reshape(1, 1, 1, 1, -1)
        # per-voxel softmax over packed class pairs, then free-unpack
        cols = logits.shape[3]
        lg = logits.reshape(B, D, H, cols, Ph_, nc)
        if return_logits:
            res = lg.reshape(B, D, H, W, nc)
        else:
            prob = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
            if return_packed:
                res = prob.reshape(B, D, H, cols, Ph_ * nc)
            else:
                res = prob.reshape(B, D, H, W, nc)
        return (res, st) if stats else res

    apply_fn.packed_head_p = Ph  # packed-tail consumers key off this
    return apply_fn, fv


def calibrate_int8(net: SegmentationNet, variables, samples,
                   dtype=jnp.bfloat16, head_p: int | None = None) -> dict:
    """Measure per-activation-site maxima for the int8 build.

    Runs the FULL-PRECISION packed forward (``stats=True``) over the given
    sample patches (an iterable of [B,D,H,W,Cin] arrays — e.g. a few real
    patches from the target distribution) and returns ``{site: amax}``,
    ready for ``build_packed_forward(quant="int8", calib=...)``. One
    measurement pass replaces the uncalibrated 8-sigma assumption with the
    model's real activation ranges; ``calib_margin`` (at build) adds
    headroom for unseen data."""
    apply_fn, fvars = build_packed_forward(net, variables, dtype=dtype,
                                           head_p=head_p, stats=True)
    # jit: the stats forward is ~60+ primitives; eager dispatch would compile
    # and dispatch each as its own program (seconds-to-minutes EACH on the
    # axon relay — CLAUDE.md "minimize program COUNT"). One program instead.
    jit_fn = jax.jit(apply_fn)
    amax: dict = {}
    for x in samples:
        _, st = jit_fn(fvars, x)
        st = jax.device_get(st)  # ONE host transfer for all ~30 scalars
        for k, v in st.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax
