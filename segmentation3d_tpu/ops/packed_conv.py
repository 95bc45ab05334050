"""Channel-packed 3x3x3 conv: the lane-packing trick in PURE XLA.

Why: XLA lowers an NDHWC conv to a GEMM with N = Cout padded to the 128-lane
MXU width, so V-Net's thin stages (Cout ∈ {2,16,32}) run at 0.5-10 TF/s
(measured, TPU v5e, 64x512^2 slab planes). This module packs ``P``
consecutive x-positions into the channel dim — a FREE reshape of NDHWC —
and converts the 3x3x3 conv into an equivalent conv over the packed layout
with a structured [3, 3, 3, P*Cin, P*Cout] kernel:

    out'[b,z,y,wq, xo*Cout+co] =
        sum_{dz,dy,dx,ci} w[dz,dy,dx,ci,co] * x[b,.., wq*P+xo+dx-1, ci]

The input voxel (g = xo+dx-1) lives in packed column wq + floor(g/P) at
packed channel (g mod P)*Cin + ci, so the packed kernel's x-extent stays 3
and SAME padding reproduces the original boundary semantics. FLOPs grow by
exactly P, but the GEMM becomes [*, P*Cin*27] @ [., P*Cout >= 128] which the
MXU runs at 80-160 TF/s — a measured 3-10x net win on the thin stages, with
none of the Pallas/Mosaic compile fragility and full XLA fusion of the
bias/activation/residual epilogue. Differentiable (pure XLA), so it also
serves the training path, unlike the forward-only Pallas kernel.

Pick ``P = 128 // max(Cin, Cout)`` (so both packed channel counts reach >=
128 without exceeding it on the contraction side).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pick_p(cin: int, cout: int, target: int = 128) -> int:
    """Largest power-of-2 packing so max(P*cin, P*cout) <= target (>=1)."""
    p = 1
    while 2 * p * max(cin, cout) <= target:
        p *= 2
    return p


def pack_kernel(w, P: int):
    """[3,3,3,Cin,Cout] -> packed [3,3,3,P*Cin,P*Cout] (see module doc).

    Works on traced jnp arrays (training path). For concrete weights prefer
    :func:`pack_kernel_np` — building the packed kernel with numpy at
    build time keeps the P*3 scatter ops out of the traced program (they
    bloated the inference HLO and its compile-cache entry otherwise).
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    wk = jnp.zeros((3, 3, 3, P * cin, P * cout), w.dtype)
    for xo in range(P):
        for dx in range(3):
            g = xo + dx - 1
            dxq = 1 + (g // P)          # in {0,1,2}: left/center/right column
            xv = g % P
            wk = wk.at[:, :, dxq, xv * cin:(xv + 1) * cin,
                       xo * cout:(xo + 1) * cout].set(w[:, :, dx])
    return wk


def pack_kernel_np(w: np.ndarray, P: int) -> np.ndarray:
    """Numpy mirror of :func:`pack_kernel` for concrete (folded) weights."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    wk = np.zeros((3, 3, 3, P * cin, P * cout), w.dtype)
    for xo in range(P):
        for dx in range(3):
            g = xo + dx - 1
            wk[:, :, 1 + (g // P), (g % P) * cin:(g % P + 1) * cin,
               xo * cout:(xo + 1) * cout] = w[:, :, dx]
    return wk


def _conv_f32(x, w, strides, padding, dn, grad_safe):
    """conv with f32 accumulation output. ``grad_safe=True`` (the traced
    training path) keeps the conv's OUTPUT dtype equal to its input dtype
    and upcasts after: mixing bf16 operands with
    ``preferred_element_type=f32`` breaks reverse-mode AD (the transpose
    rule feeds the f32 cotangent back into a conv against the bf16 operand
    -> "requires arguments to have the same dtypes"). The MXU accumulates
    bf16 GEMMs in f32 internally either way; grad_safe only rounds the
    result once more at the conv boundary."""
    if grad_safe and x.dtype != jnp.float32:
        out = jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn)
        return out.astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _conv_acc(x, w, strides, padding, dn, grad_safe, accum):
    """Conv with selectable OUTPUT precision for the inference forwards.

    ``accum="f32"``: f32 result (``preferred_element_type``) — the round-2
    default; every conv output materializes at 2x bytes and the following
    bias+act+cast fusion re-reads it. ``accum="bf16"``: the conv emits bf16
    directly (the MXU still accumulates each GEMM tile in f32 internally —
    only the OUTPUT rounding moves before the bias add instead of after
    act). This matches the flax reference forward's own numerics (flax
    convs under ``dtype=bf16`` emit bf16), and cuts the f32 write+read of
    every big activation: profiled ~170 ms/volume of act/cast passes on
    the 512^3 slab headline, measured 68.7 -> see BASELINE.md round-3.

    ``accum="bf16"`` composes with ``grad_safe``: with bf16 operands and no
    ``preferred_element_type`` the output dtype equals the input dtype, so
    the conv transpose rule sees consistent dtypes — it is exactly the
    grad-safe lowering MINUS the f32 upcast (which the training profile
    showed materializing full-size f32 activations, e.g. a 900 MB
    f32[8,96,96,12,256] per step at the 96^3/batch-8 full-res level)."""
    if accum == "bf16" and x.dtype == jnp.bfloat16:
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn)
    return _conv_f32(x, w, strides, padding, dn, grad_safe)


def packed_conv3d_pre(x, wk, bp=None, *, P: int, cout: int,
                      out_dtype=jnp.bfloat16, grad_safe: bool = False,
                      accum: str = "f32"):
    """:func:`packed_conv3d` with a PREBUILT packed kernel ``wk``
    [3,3,3,P*Cin,P*Cout] (and pre-tiled bias ``bp`` [P*Cout]). Used by the
    fused inference forward, which builds kernels once with numpy and passes
    them as jit arguments — keeping the big packed kernels out of the traced
    program's constants (a 190 MB HLO otherwise: slow hash, dead compile
    cache, minutes of first-case latency over the remote-compile relay)."""
    B, D, H, W, cin_p = x.shape
    cdtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    Wp = -(-W // P) * P
    xq = x.astype(cdtype)
    if Wp != W:
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, Wp - W), (0, 0)))
    xp = xq.reshape(B, D, H, Wp // P, P * cin_p)        # free reshape
    out = _conv_acc(xp, wk.astype(cdtype), (1, 1, 1), "SAME",
                    ("NDHWC", "DHWIO", "NDHWC"), grad_safe, accum)
    if bp is not None:
        out = out + bp.astype(out.dtype).reshape(1, 1, 1, 1, -1)
    out = out.reshape(B, D, H, Wp, cout)
    if Wp != W:
        out = out[:, :, :, :W]
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("P", "out_dtype"))
def packed_conv3d(x, w, b=None, P: int | None = None, out_dtype=jnp.bfloat16):
    """Stride-1 SAME 3x3x3 conv via x-into-channel packing (pure XLA).

    ``x``: [B,D,H,W,Cin]; ``w``: [3,3,3,Cin,Cout]; ``b``: [Cout] or None.
    Returns f32 accumulation cast to ``out_dtype``. No activation — XLA
    fuses whatever elementwise epilogue follows.
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    # compute dtype follows x (f32 in, f32 GEMM) so the conv transpose rule
    # sees consistent dtypes under jax.grad
    cdtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    if P is None:
        P = pick_p(cin, cout)
    if P <= 1:
        out = _conv_f32(x.astype(cdtype), w.astype(cdtype), (1, 1, 1), "SAME",
                        ("NDHWC", "DHWIO", "NDHWC"), grad_safe=True)
        if b is not None:
            out = out + b.reshape(1, 1, 1, 1, -1).astype(jnp.float32)
        return out.astype(out_dtype)

    wk = pack_kernel(w.astype(cdtype), P)
    bp = None if b is None else jnp.tile(b.astype(jnp.float32), (P,))
    return packed_conv3d_pre(x, wk, bp, P=P, cout=cout, out_dtype=out_dtype,
                             grad_safe=True)


def pick_window_p(cout: int, target: int = 128, cap: int = 32) -> int:
    """Smallest power-of-2 P with P*cout >= target (the GEMM N dim).

    Capped at 32: for very thin Cout the K-side inflation of a larger P
    costs more than the N-side lane padding it saves (measured on the
    32->2 head @64x512^2 slab, bf16: P=16 24.2 ms, P=32 21.9, P=64 60.5).
    """
    p = 1
    while p * cout < target and p < cap:
        p *= 2
    return p


def head_p_for(W: int, cout: int, cap: int = 32) -> int:
    """Largest power-of-2 head packing that DIVIDES ``W``, starting from
    :func:`pick_window_p`'s lane-filling choice. Crop widths are always a
    multiple of max_stride (16), so this is >= 16 in practice — it frees
    the packed forwards from the historical ``W % 32 == 0`` constraint
    (W = 48, 80, 112, ... now pack at Ph=16 instead of falling back to the
    2.4x-slower window backend)."""
    p = pick_window_p(cout, cap=cap)
    while p > 1 and W % p:
        p //= 2
    return p


def window_kernels(w, P: int):
    """[3,3,3,Cin,Cout] -> (mid, left, right) kernels for the window conv.

    Window index ``j`` of packed column q reads input x = qP + j - 1
    (j in [0, P+2)). The packed view ``xp`` (a FREE reshape) holds taps
    j=1..P at channel block j-1; the two halo taps (j=0 / j=P+1) come from
    1/P-size lane slices of the neighbour column. ``mid``:
    [3,3,1,P*Cin,P*Cout] with
    ``mid[dz,dy,0,(j-1)*Cin+ci, xo*Cout+co] = w[dz,dy,j-xo,ci,co]``;
    ``left``/``right``: NARROW [3,3,1,Cin,Cout] kernels (= ``w[:,:,0]`` /
    ``w[:,:,2]``) whose single-block output is added into output block
    xo=0 / xo=P-1 by :func:`window_conv_packed`. (Round-2 shipped them as
    [3,3,1,Cin,P*Cout] with P-1 zero blocks: each halo conv then wrote a
    FULL-size f32 tensor that was 1/P useful — profiled at ~40 ms/volume
    of pure zero traffic on the 512^3 slab headline.)
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    mid = jnp.zeros((3, 3, 1, P * cin, P * cout), w.dtype)
    for xo in range(P):
        for dx in range(3):
            j = xo + dx
            if 1 <= j <= P:
                mid = mid.at[:, :, 0, (j - 1) * cin:j * cin,
                             xo * cout:(xo + 1) * cout].set(w[:, :, dx])
    return mid, w[:, :, 0:1], w[:, :, 2:3]


def window_kernels_np(w: np.ndarray, P: int):
    """Numpy mirror of :func:`window_kernels` for concrete (folded) weights."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    mid = np.zeros((3, 3, 1, P * cin, P * cout), w.dtype)
    for xo in range(P):
        for dx in range(3):
            j = xo + dx
            if 1 <= j <= P:
                mid[:, :, 0, (j - 1) * cin:j * cin,
                    xo * cout:(xo + 1) * cout] = w[:, :, dx]
    return mid, w[:, :, 0:1].copy(), w[:, :, 2:3].copy()


@functools.partial(jax.jit, static_argnames=("P", "out_dtype"))
def window_conv3d(x, w, b=None, P: int | None = None, out_dtype=jnp.bfloat16):
    """Stride-1 SAME 3x3x3 conv via overlapping x-window unfolding.

    Strictly better FLOP economics than :func:`packed_conv3d`: packing P
    x-positions into the GEMM N dim while unfolding the P+2 input columns
    each window needs into the K dim inflates dense FLOPs by only
    ``(P+2)/3`` (vs the free-reshape pack's ``P``), at the cost of two
    1/P-size halo slices. With the smallest P where ``P*Cout >= 128``:

        Cout 64 -> P=2,  inflation 1.33x   (vs 2x packed)
        Cout 32 -> P=4,  inflation 2x      (vs 4x)
        Cout 16 -> P=8,  inflation 3.33x   (vs 8x)
        Cout  2 -> P=64, inflation 22x     (vs 64x effective)

    Pure XLA, differentiable; no activation (XLA fuses the epilogue).
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    cdtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    if P is None:
        P = pick_window_p(cout)
    if P <= 1:
        return packed_conv3d(x, w, b, P=1, out_dtype=out_dtype)

    mid, wl, wr = window_kernels(w.astype(cdtype), P)
    bp = None if b is None else jnp.tile(b.astype(jnp.float32), (P,))
    # bf16 inputs: emit bf16 (matches the direct lowering's own numerics —
    # no preferred_element_type — and skips the f32 intermediate)
    accum = "bf16" if cdtype == jnp.bfloat16 else "f32"
    return window_conv3d_pre(x, mid, wl, wr, bp, P=P, cout=cout,
                             out_dtype=out_dtype, grad_safe=True,
                             accum=accum)


def window_conv_packed(xp, mid, wl, wr, bp=None, *, P: int, cin: int,
                       grad_safe: bool = False, accum: str = "f32"):
    """Packed-domain stride-1 window conv: ``xp`` [B,D,H,cols,P*cin] ->
    f32 [B,D,H,cols,P*cout]. The packed-form core of
    :func:`window_conv3d_pre`; the packed-domain V-Net forward
    (``models/packed_vnet.py``) calls it directly so activations never
    leave the channels-minor packed layout between ops.

    Decomposes into THREE convs: the bulk on the packed view (taps
    j=1..P; no input copy at all), plus two 1/P-size halo convs on lane
    slices of the neighbour column. The halo kernels are NARROW
    [3,3,1,Cin,Cout] (see :func:`window_kernels`); their single-block f32
    outputs are channel-padded into blocks xo=0 / xo=P-1 (a fused
    pad-of-zeros + add — never a full-size halo conv output). The column
    shift rides the conv's x padding ((1,-1) / (-1,1)) instead of an
    explicit pad: round-2's slice+pad of the big tensor made XLA relayout
    the ENTIRE activation before slicing (~100 ms/volume of copies on the
    512^3 slab headline, `copy_bitcast_fusion`+`slice`+`pad` in the
    profile). Never materializes a full unfolded copy — a single-conv
    formulation with a concatenated [.., (P+2)*Cin] input OOMed the 512^3
    slab program (XLA rematerializes the big temporary with 8-16x
    tile-padded layouts)."""
    cdtype = jnp.float32 if xp.dtype == jnp.float32 else jnp.bfloat16
    xp = xp.astype(cdtype)
    cout = wl.shape[-1]

    zy_same = ((1, 1), (1, 1), (0, 0))
    dn = ("NDHWC", "DHWIO", "NDHWC")
    out = _conv_acc(xp, mid.astype(cdtype), (1, 1, 1), zy_same, dn,
                    grad_safe, accum)             # [B,D,H,cols,P*cout]
    # left halo: output col q reads col q-1's lane P-1 (x pad (1,-1));
    # right halo: col q+1's lane 0 (x pad (-1,1)); zero-extended at edges
    lc = _conv_acc(xp[..., (P - 1) * cin:], wl.astype(cdtype), (1, 1, 1),
                   ((1, 1), (1, 1), (1, -1)), dn, grad_safe, accum)
    rc = _conv_acc(xp[..., :cin], wr.astype(cdtype), (1, 1, 1),
                   ((1, 1), (1, 1), (-1, 1)), dn, grad_safe, accum)
    pad4 = ((0, 0),) * 4
    out = out + jnp.pad(lc, pad4 + ((0, (P - 1) * cout),))
    out = out + jnp.pad(rc, pad4 + (((P - 1) * cout, 0),))
    if bp is not None:
        out = out + bp.astype(out.dtype).reshape(1, 1, 1, 1, -1)
    return out


def window_conv3d_pre(x, mid, wl, wr, bp=None, *, P: int, cout: int,
                      out_dtype=jnp.bfloat16, grad_safe: bool = False,
                      accum: str = "f32"):
    """:func:`window_conv3d` with PREBUILT (mid, left, right) kernels and
    pre-tiled bias — see :func:`packed_conv3d_pre` for why the fused forward
    passes kernels as arguments instead of closure constants."""
    B, D, H, W, cin = x.shape
    cdtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    cols = -(-W // P)
    Wp = cols * P
    xq = x.astype(cdtype)
    if Wp != W:
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, Wp - W), (0, 0)))
    xp = xq.reshape(B, D, H, cols, P * cin)       # free reshape
    out = window_conv_packed(xp, mid, wl, wr, bp, P=P, cin=cin,
                             grad_safe=grad_safe, accum=accum)
    out = out.reshape(B, D, H, Wp, cout)
    if Wp != W:
        out = out[:, :, :, :W]
    return out.astype(out_dtype)


def down_kernel(w, P: int):
    """Traced (differentiable) twin of :func:`down_kernel_np` for the
    packed-domain TRAINING forward, where the conv weight is a live
    parameter: the P scatter-assembly ops run per step but cost ~KBs."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (2, 2, 2) and P % 2 == 0
    P2 = P // 2
    mid = jnp.zeros((2, 2, 1, P * cin, P2 * cout), w.dtype)
    for xo in range(P2):
        for dx in range(2):
            t = 2 * xo + dx
            mid = mid.at[:, :, 0, t * cin:(t + 1) * cin,
                         xo * cout:(xo + 1) * cout].set(w[:, :, dx])
    return mid


def deconv_gemm(w, P: int):
    """Traced (differentiable) twin of :func:`deconv_gemm_np`."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (2, 2, 2)
    wf = w[::-1, ::-1, ::-1]
    P_out = 2 * P
    k = jnp.zeros((1, 1, 1, P * cin, 4 * P_out * cout), w.dtype)
    for xo in range(P):
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    oc = ((dz * 2 + dy) * P_out + (2 * xo + dx)) * cout
                    k = k.at[0, 0, 0, xo * cin:(xo + 1) * cin,
                             oc:oc + cout].set(wf[dz, dy, dx])
    return k


def down_kernel_np(w: np.ndarray, P: int):
    """k=2/s=2 VALID down conv as a packed-domain conv kernel.

    Output x position ``q*(P/2)+xo`` reads inputs ``q*P + 2*xo + dx``
    (dx in {0,1}) — both inside the SAME packed column, so the whole
    stride-2 conv is ONE conv [2,2,1, P*Cin, (P/2)*Cout] over (z,y,cols)
    with window strides (2,2,1) and VALID padding: no halos, and the thin
    Cout (32/64) reaches the full 128 GEMM lanes instead of the direct
    lowering's padded ones. Requires P even."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (2, 2, 2) and P % 2 == 0
    P2 = P // 2
    mid = np.zeros((2, 2, 1, P * cin, P2 * cout), w.dtype)
    for xo in range(P2):
        for dx in range(2):
            t = 2 * xo + dx
            mid[:, :, 0, t * cin:(t + 1) * cin,
                xo * cout:(xo + 1) * cout] = w[:, :, dx]
    return mid


def down_conv_packed(xp, mid, bp=None, *, grad_safe: bool = False,
                     accum: str = "f32"):
    """Packed k=2/s=2 down conv: [B,D,H,cols,P*Cin] ->
    f32 (or bf16, ``accum``) [B,D/2,H/2,cols,(P/2)*Cout] (cols unchanged)."""
    cdtype = jnp.float32 if xp.dtype == jnp.float32 else jnp.bfloat16
    dn = ("NDHWC", "DHWIO", "NDHWC")
    out = _conv_acc(xp.astype(cdtype), mid.astype(cdtype), (2, 2, 1),
                    ((0, 0), (0, 0), (0, 0)), dn, grad_safe, accum)
    if bp is not None:
        out = out + bp.astype(out.dtype).reshape(1, 1, 1, 1, -1)
    return out


def deconv_gemm_np(w: np.ndarray, P: int):
    """k=2/s=2 VALID ConvTranspose as a packed-domain 1x1 GEMM kernel.

    With kernel extent == stride every output voxel is one linear map of
    one input voxel. In the packed domain the x-interleave is FREE (output
    x position ``2*xo+dx`` is just a channel block), so only the z/y
    unshuffle (a transpose of contiguous 128-lane blocks) remains — the
    full-spatial interleave that made :func:`deconv2x` lose in-net
    disappears. Kernel: [1,1,1, P*Cin, 4 * 2P*Cout] with output channel
    order (dz, dy, (2*xo+dx)*Cout + co). Matches
    ``jax.lax.conv_transpose(..., (2,2,2), "VALID")`` (flipped taps)."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (2, 2, 2)
    wf = w[::-1, ::-1, ::-1]
    P_out = 2 * P
    k = np.zeros((1, 1, 1, P * cin, 4 * P_out * cout), w.dtype)
    for xo in range(P):
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    oc = ((dz * 2 + dy) * P_out + (2 * xo + dx)) * cout
                    k[0, 0, 0, xo * cin:(xo + 1) * cin,
                      oc:oc + cout] = wf[dz, dy, dx]
    return k


def deconv_gemm_apply(xp, k, bp=None, *, cout: int, P_out: int,
                      grad_safe: bool = False, accum: str = "f32"):
    """GEMM half of the packed k=2/s=2 deconv: [B,D,H,cols,P*Cin] ->
    f32 (or bf16, ``accum``) [B,D,H,cols,2,2,P_out*Cout] (dz, dy still
    folded in channels). Apply the activation + bf16 cast on THIS form,
    then :func:`deconv_unshuffle` — transposing the post-activation bf16
    tensor halves the unshuffle's bytes vs transposing the f32 accumulation
    (profiled: a 4.9 ms/slab f32 rank-7 copy on the 512^2 slab forward)."""
    B, D, H, cols, _ = xp.shape
    cdtype = jnp.float32 if xp.dtype == jnp.float32 else jnp.bfloat16
    dn = ("NDHWC", "DHWIO", "NDHWC")
    out = _conv_acc(xp.astype(cdtype), k.astype(cdtype), (1, 1, 1),
                    ((0, 0), (0, 0), (0, 0)), dn, grad_safe, accum)
    if bp is not None:
        bt = jnp.tile(bp.astype(out.dtype), (P_out,))
        out = out + jnp.tile(bt, (4,)).reshape(1, 1, 1, 1, -1)
    return out.reshape(B, D, H, cols, 2, 2, P_out * cout)


def deconv_unshuffle(y):
    """z/y unshuffle of :func:`deconv_gemm_apply`'s output:
    [B,D,H,cols,2,2,C'] -> [B,2D,2H,cols,C'] (contiguous 128-lane block
    transpose; the x-interleave already happened for free in channels)."""
    B, D, H, cols, _, _, C = y.shape
    out = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
    return out.reshape(B, 2 * D, 2 * H, cols, C)


def deconv_packed(xp, k, bp=None, *, cout: int, P_out: int,
                  grad_safe: bool = False):
    """Packed k=2/s=2 deconv: [B,D,H,cols,P*Cin] ->
    f32 [B,2D,2H,cols,P_out*Cout] with ``P_out = 2*P`` (cols unchanged)."""
    y = deconv_gemm_apply(xp, k, bp, cout=cout, P_out=P_out,
                          grad_safe=grad_safe)
    return deconv_unshuffle(y)


def interleave_perm_np(P: int, ca: int, cb: int) -> np.ndarray:
    """0/1 permutation GEMM turning a BLOCK-concat of two packed tensors
    into the standard x-major packed order:
    ``out[xo*(ca+cb)+c] = in[xo*ca+c]`` for ``c < ca`` else
    ``in[P*ca + xo*cb + (c-ca)]``. Expressing the skip-concat interleave
    as a 1x1 conv keeps everything rank-5 channels-minor — a rank-6
    reshape/concat formulation made XLA materialize cols-minor layouts and
    burn ~25 ms/slab in copies around every decoder concat (profiled)."""
    ct = ca + cb
    m = np.zeros((1, 1, 1, P * ct, P * ct), np.float32)
    for xo in range(P):
        for c in range(ca):
            m[0, 0, 0, xo * ca + c, xo * ct + c] = 1.0
        for c in range(cb):
            m[0, 0, 0, P * ca + xo * cb + c, xo * ct + ca + c] = 1.0
    return m


def block_sigma_np(P: int, ca: int, cb: int) -> np.ndarray:
    """sigma[i_block] = standard packed lane of BLOCK-concat lane i.

    The round-5 concat lane-relabeling fold (VERDICT round-4 next #3): a
    skip concat can stay in cheap BLOCK order ([packed-a lanes | packed-b
    lanes]) with the interleave permutation folded STATICALLY into the
    consumer kernels — ``K_block = K_std.take(sigma, axis=K_in)`` — instead
    of running :func:`interleave_perm_np`'s GEMM (and, on the int8 path,
    its extra int32->int8 requant pass) per activation."""
    ct = ca + cb
    sig = np.empty(P * ct, np.int64)
    for xo in range(P):
        sig[xo * ca:(xo + 1) * ca] = xo * ct + np.arange(ca)
        sig[P * ca + xo * cb:P * ca + (xo + 1) * cb] = \
            xo * ct + ca + np.arange(cb)
    return sig


def sigma_expand_np(sig: np.ndarray, groups: int) -> np.ndarray:
    """The same lane relabeling after a free repack that merges ``groups``
    packed columns into one (P -> P*groups): per-column permutations tile
    (repack concatenates whole columns' lane blocks unchanged)."""
    n = sig.size
    return np.concatenate([q * n + sig for q in range(groups)])


def _lane_runs(idx: np.ndarray):
    """Contiguous (start, stop) runs of an ascending lane-index array."""
    runs, s = [], 0
    for i in range(1, idx.size + 1):
        if i == idx.size or idx[i] != idx[i - 1] + 1:
            runs.append((int(idx[s]), int(idx[i - 1]) + 1))
            s = i
    return runs


def block_plan(sigma: np.ndarray, P: int, ct: int, cout: int,
               out_block: bool):
    """Static slicing plan for a window conv consuming a BLOCK-order packed
    tensor (see :func:`block_sigma_np`).

    - ``l_in``/``r_in``: lane runs of the block tensor holding the std
      x-offset P-1 / x-offset 0 channels (the halo convs' inputs); taken in
      ascending block position they concatenate back to std channel order,
      so the narrow halo kernels stay unchanged.
    - ``l_out``/``r_out``: (block_lo, block_hi, std_lo, std_hi) pad runs
      for the halo outputs. Std pads when ``out_block`` is False; when True
      (the conv's OUTPUT is also lane-relabeled to block order, for a
      residual add against the block identity — requires cout == ct) the
      halo contributions land at the block positions of std lanes
      [0, cout) / [(P-1)*cout, P*cout).
    """
    inv = np.argsort(sigma)
    plan = {
        "l_in": _lane_runs(inv[(P - 1) * ct:P * ct]),
        "r_in": _lane_runs(inv[:ct]),
    }
    if not out_block:
        plan["l_out"] = [(0, cout, 0, cout)]
        plan["r_out"] = [((P - 1) * cout, P * cout, 0, cout)]
        plan["n_out"] = P * cout
        return plan
    assert cout == ct, "out_block lane relabeling requires cout == ca + cb"

    def out_runs(std_lo):
        rs = []
        for a, b in _lane_runs(inv[std_lo:std_lo + cout]):
            rs.append((a, b, int(sigma[a]) - std_lo,
                       int(sigma[b - 1]) + 1 - std_lo))
        return rs

    plan["l_out"] = out_runs(0)
    plan["r_out"] = out_runs((P - 1) * cout)
    plan["n_out"] = P * cout
    return plan


def take_lanes(x, runs):
    """Concatenate lane slices ``x[..., a:b]`` for the plan's runs."""
    parts = [x[..., a:b] for a, b in runs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _scatter_halo(out, hc, runs, n_out):
    """Add the narrow halo conv output ``hc [.., cout]`` into ``out`` at the
    plan's (block_lo, block_hi, std_lo, std_hi) runs (fused pad+add)."""
    pad4 = ((0, 0),) * 4
    for a, b, sa, sb in runs:
        out = out + jnp.pad(hc[..., sa:sb], pad4 + ((a, n_out - b),))
    return out


def window_conv_packed_block(xp, mid_b, wl, wr, bp=None, *, plan,
                             grad_safe: bool = False, accum: str = "f32"):
    """:func:`window_conv_packed` for a BLOCK-order packed input: ``mid_b``
    is the mid kernel pre-gathered by ``sigma`` on its input axis (and on
    its output axis too when the plan was built ``out_block=True``); the
    narrow halo kernels are UNCHANGED (``take_lanes`` reassembles their
    std-ordered inputs from the block runs). ``bp`` must be pre-gathered
    to the output order the plan emits."""
    cdtype = jnp.float32 if xp.dtype == jnp.float32 else jnp.bfloat16
    xp = xp.astype(cdtype)
    zy_same = ((1, 1), (1, 1), (0, 0))
    dn = ("NDHWC", "DHWIO", "NDHWC")
    out = _conv_acc(xp, mid_b.astype(cdtype), (1, 1, 1), zy_same, dn,
                    grad_safe, accum)
    lc = _conv_acc(take_lanes(xp, plan["l_in"]), wl.astype(cdtype), (1, 1, 1),
                   ((1, 1), (1, 1), (1, -1)), dn, grad_safe, accum)
    rc = _conv_acc(take_lanes(xp, plan["r_in"]), wr.astype(cdtype), (1, 1, 1),
                   ((1, 1), (1, 1), (-1, 1)), dn, grad_safe, accum)
    out = _scatter_halo(out, lc, plan["l_out"], plan["n_out"])
    out = _scatter_halo(out, rc, plan["r_out"], plan["n_out"])
    if bp is not None:
        out = out + bp.astype(out.dtype).reshape(1, 1, 1, 1, -1)
    return out


def concat_packed(a, b, ca: int, cb: int, perm=None):
    """Packed-channel concat of a [.., P*ca] and b [.., P*cb] (same P) into
    the standard x-major order [.., P*(ca+cb)].

    With ``perm`` (from :func:`interleave_perm_np`): block-concat (one
    cheap rank-5 concatenate) followed by the permutation GEMM. Without:
    P must be 1 (block order == standard order)."""
    P = a.shape[-1] // ca
    cat = jnp.concatenate([a, b.astype(a.dtype)], axis=-1)
    if P == 1:
        return cat
    assert perm is not None, "P > 1 packed concat needs interleave_perm_np"
    cdtype = jnp.float32 if a.dtype == jnp.float32 else jnp.bfloat16
    out = jax.lax.conv_general_dilated(
        cat.astype(cdtype), perm.astype(cdtype), (1, 1, 1),
        ((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out.astype(a.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def deconv2x(x, w, b=None, out_dtype=jnp.bfloat16):
    """ConvTranspose3d(kernel=2, stride=2, VALID) as GEMM + pixel shuffle.

    With kernel extent == stride there is no tap overlap: every output voxel
    is ONE linear map of one input voxel, so the whole deconv is
    ``[B*D*H*W, Cin] @ [Cin, 8*Cout]`` — full 128-lane MXU utilization even
    for thin Cout (the direct lowering pads Cout to 128: measured 0.5-5 TF/s
    on V-Net's up convs) — followed by a depth-to-space interleave.

    Matches ``jax.lax.conv_transpose(x, w, (2,2,2), "VALID",
    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))`` with ``w``
    [2,2,2,Cin,Cout] (parity-tested).
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    cdtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    # conv_transpose applies the kernel FLIPPED (tap (0,0,0) lands at output
    # offset (1,1,1)) — flip so the GEMM matches its semantics exactly
    wf = w.astype(cdtype)[::-1, ::-1, ::-1]
    wm = jnp.transpose(wf, (3, 0, 1, 2, 4)).reshape(cin, 8 * cout)
    y = jnp.dot(x.astype(cdtype).reshape(B * D * H * W, cin), wm,
                preferred_element_type=jnp.float32)
    if b is not None:
        y = y + jnp.tile(b.astype(jnp.float32), (8,)).reshape(1, -1)
    y = y.reshape(B, D, H, W, 2, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(B, 2 * D, 2 * H, 2 * W, cout).astype(out_dtype)
