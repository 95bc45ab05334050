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


def pack_weights(w, L: int):
    """[3,3,3,Cin,Cout] -> (Wc, Wl, Wr) GEMM matrices for the v3 kernel.

    - ``Wc [9*L*Cin, L*Cout]``: within-block taps. K index =
      ((dz*3+dy)*L + xv)*Cin + ci for block-local input voxel xv ∈ [0, L);
      N index = xo*Cout + co; entry = w[dz, dy, (xv-xo)+1] iff |xv-xo| <= 1.
    - ``Wl [9*Cin, L*Cout]``: the left-neighbor block's last voxel
      (block-local -1) — feeds only xo = 0 with w[.., dx=0].
    - ``Wr [9*Cin, L*Cout]``: the right-neighbor block's first voxel
      (block-local L) — feeds only xo = L-1 with w[.., dx=2].
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3), "pack_weights supports 3x3x3 kernels"
    w9 = jnp.asarray(w).reshape(9, 3, cin, cout)       # [dzdy, dx, ci, co]
    xv = np.arange(L)
    xo = np.arange(L)
    dx = xv[:, None] - xo[None, :]                     # [L, L] in {-1,0,1} valid
    valid = np.abs(dx) <= 1
    wc = w9[:, np.clip(dx + 1, 0, 2), :, :]            # [9, L, L, ci, co]
    wc = jnp.where(jnp.asarray(valid)[None, :, :, None, None], wc, 0.0)
    wc = jnp.transpose(wc, (0, 1, 3, 2, 4)).reshape(9 * L * cin, L * cout)

    wl = jnp.zeros((9, cin, L, cout), w9.dtype).at[:, :, 0, :].set(w9[:, 0])
    wr = jnp.zeros((9, cin, L, cout), w9.dtype).at[:, :, L - 1, :].set(w9[:, 2])
    return (wc, wl.reshape(9 * cin, L * cout), wr.reshape(9 * cin, L * cout))


def fold_bn(w, b, scale, bias, mean, var, eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights/bias:
    ``bn(conv(x, w) + b) == conv(x, w') + b'``."""
    s = scale / jnp.sqrt(var + eps)
    w2 = w * s[None, None, None, None, :]
    b0 = b if b is not None else 0.0
    b2 = (b0 - mean) * s + bias
    return w2, b2


def fold_bn_np(w, b, scale, bias, mean, var, eps: float = 1e-5):
    """Pure-numpy :func:`fold_bn` for the HOST fold paths (build_packed_/
    fused_forward run ~30 per-site folds; as jnp ops each dispatches a tiny
    program to the device backend — ~90 ms apiece on the relay, measured
    ~6.5 s of a 12 s validation save point in round 5 — where the same
    math in numpy is microseconds)."""
    import numpy as np
    w = np.asarray(w, np.float32)
    s = np.asarray(scale, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    w2 = w * s[None, None, None, None, :]
    b0 = np.asarray(b, np.float32) if b is not None else np.float32(0.0)
    b2 = (b0 - np.asarray(mean, np.float32)) * s \
        + np.asarray(bias, np.float32)
    return w2, b2


def _conv_kernel(p0_ref, p1_ref, p2_ref, wc_ref, wl_ref, wr_ref, b_ref,
                 out_ref, *, H, Wb, L, cin, cout, act, alpha,
                 residual="none", res_alpha=0.25, quant_inv_sa=None):
    """v3 plane kernel — no prebuilt windows.

    p{0,1,2}: z-1/z/z+1 packed plane TILES [1, 8 + Wb + H*Wb + Wb + 8,
    L*Cin] (H here = the y-tile height; y-halo = the Wb-row blocks at
    top/bottom; 8 spare rows allow the ±1-row boundary shifts). One big
    within-block GEMM (K = 9*L*Cin) plus 18 tiny masked boundary GEMMs
    handle the x-block edges entirely in-kernel.
    """
    M = H * Wb
    planes = (p0_ref, p1_ref, p2_ref)
    # plane row layout: [8 spare][Wb rows: y=-1][H*Wb data][Wb rows: y=H][8]
    base = 8 + Wb  # first data row (y=0)

    # center taps: tap dy reads y_in = y_out + dy - 1 -> start base+(dy-1)*Wb
    center = [planes[t // 3][0, base + ((t % 3) - 1) * Wb:
                             base + ((t % 3) - 1) * Wb + M, :]
              for t in range(9)]
    a = jnp.concatenate(center, axis=-1)               # [M, 9*L*Cin]
    acc = jnp.dot(a, wc_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:]

    # boundary masks on output rows: row m corresponds to (y, wb = m % Wb)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    has_left = (rows % Wb != 0).astype(acc.dtype)
    has_right = (rows % Wb != Wb - 1).astype(acc.dtype)

    # left neighbor block's LAST voxel lives one row up (same y); right
    # neighbor's FIRST voxel one row down — masked at block edges. Two
    # K=9*Cin GEMMs beat 18 tiny dots (measured 7.6 vs 11.0 ms at 96^3/32ch).
    lparts = [planes[t // 3][0, base + ((t % 3) - 1) * Wb - 1:
                             base + ((t % 3) - 1) * Wb - 1 + M, (L - 1) * cin:]
              for t in range(9)]
    rparts = [planes[t // 3][0, base + ((t % 3) - 1) * Wb + 1:
                             base + ((t % 3) - 1) * Wb + 1 + M, :cin]
              for t in range(9)]
    lacc = jnp.dot(jnp.concatenate(lparts, axis=-1), wl_ref[:],
                   preferred_element_type=jnp.float32)
    racc = jnp.dot(jnp.concatenate(rparts, axis=-1), wr_ref[:],
                   preferred_element_type=jnp.float32)
    acc = acc + lacc * has_left + racc * has_right

    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "prelu":
        acc = jnp.where(acc >= 0, acc, alpha * acc)
    if residual != "none":
        # fused residual block tail (out = act2(x + convbnact(x))): the
        # identity IS the center z-plane's data rows — zero extra traffic.
        # Valid only when cin == cout (checked by the caller).
        ident = p1_ref[0, base:base + M, :].astype(jnp.float32)
        acc = acc + ident
        if residual == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif residual == "prelu":
            acc = jnp.where(acc >= 0, acc, res_alpha * acc)
    if quant_inv_sa is not None:
        # int8 requant epilogue (the quantized forward's static activation
        # scale) fused in-kernel — the XLA route pays a standalone
        # clamp_convert pass over the full-size activation otherwise
        acc = jnp.clip(jnp.round(acc * quant_inv_sa), -127, 127)
    out_ref[0] = acc.astype(out_ref.dtype)


# the axon remote-compile path rejects programs whose pallas operand exceeds
# ~512 MB (empirical: 449 MB compiles, 592 MB returns HTTP 500); stay under
# it with headroom. Module-level so tests can shrink it to force chunking.
_REMOTE_OPERAND_BYTE_CAP = 420_000_000


def _pick_ht(H, Wp, cin_p, cout_p, budget=10_000_000):
    """Largest power-of-2 y-tile whose working set (3 input planes double-
    buffered + output block) fits the VMEM budget (~16 MB total on v5e)."""
    per_row = (6 * Wp * cin_p + 2 * Wp * cout_p) * 2  # bytes per y-row
    ht = budget // per_row - 2
    if ht >= H:
        return H
    p = 8
    while p * 2 <= ht:
        p *= 2
    return max(8, min(p, H))


@functools.partial(jax.jit,
                   static_argnames=("act", "out_dtype", "L", "interpret", "ht",
                                    "residual", "alpha", "res_alpha",
                                    "quant_inv_sa"))
def thin_conv3d(x, w, b=None, act: str = "none", alpha: float = 0.25,
                out_dtype=jnp.bfloat16, L: int | None = None,
                interpret: bool = False, ht: int | None = None,
                residual: str = "none", res_alpha: float = 0.25,
                quant_inv_sa: float | None = None):
    """Stride-1 SAME 3x3x3 conv via the lane-packed Pallas kernel.

    ``x``: [B, D, H, W, Cin] (bf16/f32); ``w``: [3,3,3,Cin,Cout];
    ``b``: [Cout] or None; ``act``: none | relu | prelu (fused epilogue).

    Planes too big for VMEM (e.g. full-XY 512^2 slab stages) are y-tiled:
    the grid runs over (b, z, y-tile) and each tile carries its one-row
    y-halo, so arbitrarily large XY planes stream through the same kernel.
    ``ht`` overrides the auto-picked tile height.

    ``residual``: none | relu | prelu — fuses a whole single-conv residual
    block ``act2(x + act(bn_conv(x)))`` into the epilogue (requires
    cin == cout); the identity is read from the already-resident center
    plane, so the fusion is free of extra memory traffic.
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    if residual != "none" and cin != cout:
        raise ValueError(f"fused residual needs cin == cout, got {cin}->{cout}")
    if L is None:
        L = min(32, max(1, 128 // cout))

    def pad_ch(c):
        # smallest c' >= c with L*c' a multiple of 128 (lane-tiling alignment)
        return -(-L * c // 128) * 128 // L if (L * c) % 128 else c

    cin_p, cout_p = pad_ch(cin), pad_ch(cout)
    # sublane alignment of the dy*Wb row offsets wants Wb % 8 == 0
    Wp = -(-W // (8 * L)) * (8 * L)

    Wb = Wp // L
    lanes = L * cin_p
    Ht = int(ht) if ht else _pick_ht(H, Wp, cin_p, cout_p)
    nH = -(-H // Ht)
    Hp = nH * Ht

    # the axon remote-compile path rejects programs whose pallas operand
    # exceeds ~512 MB (empirical: 449 MB compiles, 592 MB returns HTTP 500)
    # — split the volume into overlapping z-chunks and run the same kernel
    # per chunk (SAME conv: out[z0:z1] needs input planes [z0-1, z1])
    tile_rows_est = 16 + (Ht + 2) * Wb
    est_bytes = B * (D + 2) * nH * tile_rows_est * lanes * 2
    if est_bytes > _REMOTE_OPERAND_BYTE_CAP and D > 8:
        mid = D // 2
        parts = []
        for z0, z1 in ((0, mid), (mid, D)):
            zs, ze = max(0, z0 - 1), min(D, z1 + 1)
            sub = thin_conv3d(x[:, zs:ze], w, b, act=act, alpha=alpha,
                              out_dtype=out_dtype, L=L, interpret=interpret,
                              ht=ht, residual=residual, res_alpha=res_alpha,
                              quant_inv_sa=quant_inv_sa)
            parts.append(sub[:, z0 - zs: z0 - zs + (z1 - z0)])
        return jnp.concatenate(parts, axis=1)
    xq = x.astype(jnp.bfloat16)
    if cin_p != cin:
        xq = jnp.pad(xq, ((0, 0),) * 4 + ((0, cin_p - cin),))
    if Wp != W:
        xq = jnp.pad(xq, ((0, 0),) * 3 + ((0, Wp - W), (0, 0)))
    if Hp != H:
        xq = jnp.pad(xq, ((0, 0),) * 2 + ((0, Hp - H), (0, 0), (0, 0)))
    # pack (W, Cin) -> (Wb, L*Cin): byte-identical row-major reshape (free),
    # then one pad supplies the z halo, the y halo (one Wb row-block each
    # side) and the 8 spare rows the boundary shifts read into.
    xp = xq.reshape(B, D, Hp * Wb, lanes)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (8 + Wb, Wb + 8), (0, 0)))
    tile_rows = 16 + (Ht + 2) * Wb
    if nH == 1:
        xp = xp.reshape(B * (D + 2), tile_rows, lanes)
    else:
        # overlapping y-tiles: tile i = padded rows [i*Ht*Wb, i*Ht*Wb +
        # tile_rows) — each carries its y-halo row-blocks + spare rows.
        # One row-gather (~(Ht+2)/Ht duplication) buys VMEM fit; a take is
        # used instead of stacking nH overlapping slices, which blows up the
        # XLA:TPU compile at nH >= 16. Tiles fold into the LEADING dim so
        # blocks stay 3-D (Mosaic emits ~6x slower code for 4-D blocks).
        rows_idx = (np.arange(nH)[:, None] * (Ht * Wb)
                    + np.arange(tile_rows)[None, :]).reshape(-1)
        xp = jnp.take(xp, jnp.asarray(rows_idx), axis=2)
        xp = xp.reshape(B * (D + 2) * nH, tile_rows, lanes)

    wq = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - cin), (0, cout_p - cout)))
    wc, wl, wr = (m.astype(jnp.bfloat16) for m in pack_weights(wq, L))
    bvec = jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32)
    bvec = jnp.pad(bvec, (0, cout_p - cout))
    bfull = jnp.tile(bvec, (L,)).reshape(1, L * cout_p)

    if quant_inv_sa is not None:
        out_dtype = jnp.int8
    kern = functools.partial(
        _conv_kernel, H=Ht, Wb=Wb, L=L, cin=cin_p, cout=cout_p, act=act,
        alpha=alpha, residual=residual, res_alpha=res_alpha,
        quant_inv_sa=quant_inv_sa)

    # grid over flat (b, z, y-tile); three plane specs (z-1, z, z+1 of the
    # z-padded volume) give Mosaic's automatic pipeline the halo without
    # overlapping block indexing, and it double-buffers the plane fetches.
    def plane_spec(k):
        return pl.BlockSpec(
            (1, tile_rows, lanes),
            lambda t: (((t // nH) // D * (D + 2) + (t // nH) % D + k) * nH
                       + t % nH, 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(B * D * nH,),
        in_specs=[
            plane_spec(0), plane_spec(1), plane_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # center weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # left-boundary weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # right-boundary weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_specs=pl.BlockSpec(
            (1, Ht * Wb, L * cout_p), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * D * nH, Ht * Wb, L * cout_p), out_dtype),
        interpret=interpret,
    )(xp, xp, xp, wc, wl, wr, bfull)
    out = out.reshape(B, D, Hp, Wb, L, cout_p)[..., :cout]
    out = out.reshape(B, D, Hp, Wp, cout)
    if Hp != H or Wp != W:
        out = out[:, :, :H, :W]
    return out


def thin_conv3d_reference(x, w, b=None, act: str = "none", alpha: float = 0.25,
                          residual: str = "none", res_alpha: float = 0.25):
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
    if residual != "none":
        out = out + x.astype(jnp.float32)
        if residual == "relu":
            out = jnp.maximum(out, 0.0)
        elif residual == "prelu":
            out = jnp.where(out >= 0, out, res_alpha * out)
    return out
