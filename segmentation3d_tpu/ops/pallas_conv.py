"""Pallas TPU kernel: lane-packed 3x3x3 conv for thin-channel stages.

Why: XLA lowers an NDHWC conv to a GEMM whose N dimension is Cout, padded to
the 128-lane MXU width. V-Net's high-resolution stages have Cout ∈ {2,16,32}
— measured on TPU v5e they run at 0.2-18 TF/s (4-64x lane padding waste)
while 128-channel convs hit 163 TF/s. This kernel packs ``L = 128 // Cout``
output x-positions into the lane dimension, so the GEMM output tile is
``[M, L*Cout = 128]`` — full width. The contraction gathers, per (dz, dy)
tap pair, an ``(L+2)*Cin`` input window per x-block (the banded union of the
3 dx taps of L outputs), giving a dense K of ``9*(L+2)*Cin`` with a weight
matrix that is ~(L+2)/3-sparse-but-materialized: total FLOPs grow by
(L+2)/L vs the ideal conv, in exchange for ~full MXU utilization — a 3-8x
net win on the thin stages.

Supports: stride-1 SAME 3x3x3 conv, channels-last [B,D,H,W,Cin] -> Cout,
optional fused bias + ReLU/PReLU epilogue (BatchNorm folds into w/b at
inference — see :func:`fold_bn`). Forward-only (inference path); training
uses the XLA conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _choose_L(cout: int, width: int) -> int:
    """Largest L with L*Cout <= 128 that divides the x extent."""
    L = max(1, 128 // cout)
    while L > 1 and width % L != 0:
        L //= 2
    return L


def pack_weights(w, L: int):
    """[3,3,3,Cin,Cout] -> banded GEMM matrix [9*(L+2)*Cin, L*Cout].

    Layout: K index = ((dz*3+dy)*(L+2) + xi)*Cin + ci, where xi ∈ [0, L+2)
    is the position in the x input window (absolute offset xi-1 from the
    block start); N index = xo*Cout + co. Entry = w[dz,dy,xi-xo-? ] —
    nonzero iff dx = xi - xo ∈ {0,1,2} (i.e. absolute tap (xi-1)-xo ∈
    {-1,0,1}).
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3), "pack_weights supports 3x3x3 kernels"
    K = 9 * (L + 2) * cin
    N = L * cout
    xi = np.arange(L + 2)
    xo = np.arange(L)
    dx = xi[:, None] - xo[None, :]          # [L+2, L]; valid taps: 0,1,2
    valid = (dx >= 0) & (dx <= 2)
    dxc = np.clip(dx, 0, 2)
    # wk[dzdy, xi, ci, xo, co] = w[dz, dy, dx, ci, co] * valid
    w9 = w.reshape(9, 3, cin, cout)          # [dzdy, dx, ci, co]
    wk = jnp.asarray(w9)[:, dxc, :, :]       # [9, L+2, L, cin, cout]
    wk = jnp.where(jnp.asarray(valid)[None, :, :, None, None], wk, 0.0)
    wk = jnp.transpose(wk, (0, 1, 3, 2, 4))  # [9, L+2, cin, L, cout]
    return wk.reshape(K, N)


def fold_bn(w, b, scale, bias, mean, var, eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights/bias:
    ``bn(conv(x, w) + b) == conv(x, w') + b'``."""
    s = scale / jnp.sqrt(var + eps)
    w2 = w * s[None, None, None, None, :]
    b0 = b if b is not None else 0.0
    b2 = (b0 - mean) * s + bias
    return w2, b2


def _conv_kernel(p0_ref, p1_ref, p2_ref, wk_ref, b_ref, out_ref, *,
                 H, Wb, L, cin, cout, act, alpha):
    """Plane-sliced kernel: p{0,1,2} are the z-1/z/z+1 windowed planes
    [1, (H+2)*Wb, win_pad] (auto-pipelined by BlockSpecs); out block
    [1, H*Wb, L*Cout]. Nine accumulating GEMMs, one per (dz, dy) tap."""
    win = (L + 2) * cin
    planes = (p0_ref, p1_ref, p2_ref)
    parts = [planes[dzdy // 3][0, (dzdy % 3) * Wb:((dzdy % 3) + H) * Wb, :win]
             for dzdy in range(9)]
    # one MXU-shaped GEMM: K = 9*(L+2)*Cin (operand offsets are aligned
    # because Wb % 8 == 0 and the lane slice starts at 0)
    a = jnp.concatenate(parts, axis=-1)
    acc = jnp.dot(a, wk_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:]
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "prelu":
        acc = jnp.where(acc >= 0, acc, alpha * acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("act", "TY", "out_dtype", "L", "interpret"))
def thin_conv3d(x, w, b=None, act: str = "none", alpha: float = 0.25,
                TY: int = 16, out_dtype=jnp.bfloat16, L: int | None = None,
                interpret: bool = False):
    """Stride-1 SAME 3x3x3 conv via the lane-packed Pallas kernel.

    ``x``: [B, D, H, W, Cin] (bf16/f32); ``w``: [3,3,3,Cin,Cout];
    ``b``: [Cout] or None; ``act``: none | relu | prelu (fused epilogue).
    H must be divisible by TY (use :func:`thin_conv3d_auto` otherwise).
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    if L is None:
        # pick L (x-positions per lane block) minimizing pad-waste x lane-waste
        best, best_cost = 1, float("inf")
        cand = max(1, 128 // cout)
        while cand >= 1:
            wp = -(-W // (8 * cand)) * (8 * cand)
            cost = (wp / W) * (128.0 / (cand * cout)) if cand * cout <= 128 \
                else float("inf")
            if cost < best_cost:
                best, best_cost = cand, cost
            cand //= 2
        L = best
    # sublane alignment of the dy*Wb row offsets wants Wb % 8 == 0
    Wp = -(-W // (8 * L)) * (8 * L)
    assert L * cout <= 128, (L, cout)
    del TY  # v2 kernel always processes the full H extent per z-plane

    Wb = Wp // L
    xq = x.astype(jnp.bfloat16)
    if Wp != W:
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, Wp - W), (0, 0)))
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    # Pre-build the banded x-windows at the XLA level: three aligned packed
    # views -> [..., Wb, (L+2)*Cin]. The (W, Cin) -> (Wb, L*Cin) reshape is
    # byte-identical row-major (free); Mosaic then never regroups lanes.
    def pack(v):
        return v.reshape(B, D + 2, H + 2, Wb, L * cin)
    p0 = pack(xp)
    xr = jnp.pad(xp, ((0, 0),) * 3 + ((1, 0), (0, 0)))[:, :, :, :Wp]  # x[w-1]
    xl = jnp.pad(xp, ((0, 0),) * 3 + ((0, 1), (0, 0)))[:, :, :, 1:]   # x[w+1]
    left_cols = pack(xr)[..., :cin]                    # voxel wb*L - 1
    right_cols = pack(xl)[..., (L - 1) * cin:]         # voxel wb*L + L
    xp = jnp.concatenate([left_cols, p0, right_cols], axis=-1)
    # DMA slices need a 128-aligned minor dim: pad the window lane width up
    # (the kernel slices back to the true window before the GEMM).
    win = (L + 2) * cin
    win_pad = -(-win // 128) * 128
    if win_pad != win:
        xp = jnp.pad(xp, ((0, 0),) * 4 + ((0, win_pad - win),))
    # collapse (B, D+2) and (H+2, Wb): planes indexed by flat (b, z)
    xp = xp.reshape(B * (D + 2), (H + 2) * Wb, win_pad)
    wk = pack_weights(w, L).astype(jnp.bfloat16)
    bvec = jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32)
    bfull = jnp.tile(bvec, (L,)).reshape(1, L * cout)

    kern = functools.partial(
        _conv_kernel, H=H, Wb=Wb, L=L, cin=cin, cout=cout, act=act, alpha=alpha)

    # grid over flat (b, z); three plane specs (z-1, z, z+1 in the padded
    # volume) give Mosaic's automatic pipeline the halo without overlap-
    # incapable block indexing, and it double-buffers the plane fetches.
    def plane_spec(k):
        return pl.BlockSpec(
            (1, (H + 2) * Wb, win_pad),
            lambda t: (t // D * (D + 2) + t % D + k, 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(B * D,),
        in_specs=[
            plane_spec(0), plane_spec(1), plane_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # packed weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_specs=pl.BlockSpec(
            (1, H * Wb, L * cout), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * D, H * Wb, L * cout), out_dtype),
        interpret=interpret,
    )(xp, xp, xp, wk, bfull)
    out = out.reshape(B, D, H, Wp, cout)
    return out[:, :, :, :W] if Wp != W else out


def thin_conv3d_reference(x, w, b=None, act: str = "none", alpha: float = 0.25):
    """XLA reference implementation (same math) for parity tests."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape(1, 1, 1, 1, -1)
    if act == "relu":
        out = jnp.maximum(out, 0.0)
    elif act == "prelu":
        out = jnp.where(out >= 0, out, alpha * out)
    return out
