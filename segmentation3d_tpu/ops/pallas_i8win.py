"""Pallas TPU kernel: int8 packed-domain window conv with IN-KERNEL halos.

Target (BASELINE.md round-3 int8 profile): the XLA 3-conv narrow-halo
decomposition (``ops/quant.py:window_conv_packed_i8``) leaves ~95-110
ms/volume of "halo machinery" on the 512^3 headline — the two narrow halo
convs run at ~12 TOPS on strided rank-6 s8 lane slices and materialize
full-spatial s32 outputs that the epilogue fusion then re-reads. Three
XLA-level reformulations all measured WORSE (wide-halo fold, contiguous
slice barriers, block-diag halos — see BASELINE.md counter-results); this
kernel is the one untried lever the round-3 verdict names: keep the halo
taps in VMEM.

Design (follows ``ops/pallas_conv.py:thin_conv3d``'s architecture — grid
over (b, z, y-tile), three z-plane BlockSpecs for the z halo, Mosaic
double-buffers the plane fetches; blocks stay 3-D, which Mosaic compiles
~6x faster than 4-D):

- the packed activation [B, D, H, cols, P*C] flattens (H, cols) into a row
  axis (free reshape): row r = y * cols + q, lanes = P*C = 128. In THIS
  layout every data dependency of the window conv is a plain row shift:
  the y taps are offsets ±cols, and the x halos (neighbour packed column)
  are offsets ±1 — so the halo GEMMs read the SAME resident VMEM tile the
  mid GEMM reads, and nothing but the final int8 tensor is ever written.
- per (dz, dy) tap: one dense [rows, 128] x [128, 128] int8 MXU GEMM (the
  mid kernel column of ``packed_conv.window_kernels``), plus two narrow
  [rows, cin] x [cin, cout] halo GEMMs on shifted rows. Halo sums are
  masked once per conv at the x edges (q == 0 / q == cols-1, where SAME
  padding wants zeros) — the mask is tap-independent, so it costs one
  select per side, not 9.
- the dequant + bias (+ residual add) + ReLU/PReLU + requant epilogue runs
  on the f32 accumulator in VMEM and emits int8 (or bf16 for the last conv
  of a chain) — matching ``models/packed_vnet.py``'s int8 value semantics
  exactly: weights per-output-channel int8, ONE global activation scale.

Forward-only (the int8 path is inference-only by construction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mid9_np(mid: np.ndarray) -> np.ndarray:
    """[3,3,1,PC,PC] packed mid kernel -> [9, PC, PC] GEMM matrices."""
    kd, kh, kw, pc_in, pc_out = mid.shape
    assert (kd, kh, kw) == (3, 3, 1)
    return np.ascontiguousarray(mid.reshape(9, pc_in, pc_out))


def halo9_np(w: np.ndarray) -> np.ndarray:
    """[3,3,1,cin,cout] narrow halo kernel -> [9, cin, cout]."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 1)
    return np.ascontiguousarray(w.reshape(9, cin, cout))


def halo9_full_np(w: np.ndarray, P: int, side: str) -> np.ndarray:
    """[3,3,1,cin,cout] halo kernel -> full-K [9, P*cin, cout] with the
    taps embedded at the lane block the shifted row actually carries
    (left halo reads lanes (P-1)*cin:, right halo lanes :cin; the other
    rows are zero). Lets the kernel run the halo GEMM on the UNSLICED
    shifted rows. Measured (bench_i8win.py): the narrow lane-sliced mode
    compiles AND wins at every real site geometry (the one Mosaic
    'Invalid type' failure was the P==2 empty middle-slice concat, since
    fixed), and this full-K form is 5-15% slower — kept as a tested
    fallback for future Mosaic versions, not used in production builds."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 1) and side in ("left", "right")
    full = np.zeros((9, P * cin, cout), w.dtype)
    o = (P - 1) * cin if side == "left" else 0
    full[:, o:o + cin, :] = w.reshape(9, cin, cout)
    return full


def _kernel(xm, xc, xp_, w9, wl, wr, scale, bias, alpha, out_ref, *,
            rows, cols, cin, cout, pc, act, inv_sa, out_int8, top,
            halo_full):
    """One (b, z, y-tile) program. xm/xc/xp_ are the z-1/z/z+1 planes of the
    row-padded volume, [1, tile_rows, pc] int8; out [1, rows, pc]."""
    acc = jnp.zeros((rows, pc), jnp.int32)
    accl = jnp.zeros((rows, cout), jnp.int32)
    accr = jnp.zeros((rows, cout), jnp.int32)
    planes = (xm, xc, xp_)
    base = top - cols  # tap dy reads rows base + dy*cols + o (dy-1 centred)
    span = rows + 2 * cols
    for dz in range(3):
        x = planes[dz]
        # ONE sublane-unaligned load per side per plane covering all three
        # dy offsets (loads at ±1 force a sublane rotation of the whole
        # tile on the int8 (32, 128) tiling — 18 of them dominated the
        # kernel; these 6 thin loads replace them, and the per-dy slices
        # below are slices of an already-resident value)
        if halo_full:  # unsliced lanes x zero-embedded full-K kernels
            thin_l = x[0, pl.ds(base - 1, span), :]
            thin_r = x[0, pl.ds(base + 1, span), :]
        else:
            thin_l = x[0, pl.ds(base - 1, span), (pc - cin):]
            thin_r = x[0, pl.ds(base + 1, span), :cin]
        for dy in range(3):
            t = dz * 3 + dy
            a = x[0, pl.ds(base + dy * cols, rows), :]
            acc += jax.lax.dot_general(
                a, w9[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # x halos: packed col q∓1 = row r∓1 in the flattened layout
            accl += jax.lax.dot_general(
                thin_l[dy * cols:dy * cols + rows], wl[t],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            accr += jax.lax.dot_general(
                thin_r[dy * cols:dy * cols + rows], wr[t],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    # x-edge masks (SAME padding): the shifted row at q==0 belongs to the
    # previous y (wrap) — its left-halo sum must be zero; ditto q==cols-1
    # on the right. Tap-independent, so ONE select per side.
    q = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % cols
    sc = scale[0]
    v = acc.astype(jnp.float32) * sc + bias[0]
    vl = v[:, :cout] + jnp.where(
        q > 0, accl.astype(jnp.float32) * sc[:cout], 0.0)
    vr = v[:, pc - cout:] + jnp.where(
        q < cols - 1, accr.astype(jnp.float32) * sc[pc - cout:], 0.0)
    # P == 2 has no middle blocks — Mosaic rejects the empty slice
    mid_blocks = [v[:, cout:pc - cout]] if pc > 2 * cout else []
    v = jnp.concatenate([vl] + mid_blocks + [vr], axis=1)
    if act == "relu":
        v = jnp.maximum(v, 0.0)
    elif act == "prelu":
        v = jnp.where(v >= 0, v, alpha[0] * v)
    if out_int8:
        out_ref[0] = jnp.clip(jnp.round(v * inv_sa), -127, 127
                              ).astype(jnp.int8)
    else:
        out_ref[0] = v.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=(
    "P", "cin", "cout", "act", "inv_sa", "out_int8", "ht", "interpret"))
def window_conv_i8_pallas(xp, w9, wl9, wr9, scale, bias, alpha=None, *,
                          P: int, cin: int, cout: int, act: str = "relu",
                          inv_sa: float, out_int8: bool = True,
                          ht: int | None = None, interpret: bool = False):
    """Fused int8 window conv + epilogue. ``xp`` int8 [B, D, H, cols, PC];
    ``w9`` [9, PC, PC] int8 (:func:`mid9_np`), ``wl9``/``wr9`` int8 halo
    kernels — NARROW [9, cin, cout] (:func:`halo9_np`, lane-sliced loads;
    the production mode, fastest at every measured geometry) or FULL-K
    [9, PC, cout] (:func:`halo9_full_np`, unsliced-load fallback);
    ``scale`` f32 [PC] per-lane dequant, ``bias`` f32 [PC],
    ``alpha`` f32 [PC] (prelu). Returns int8 (requantized at ``1/inv_sa``)
    or bf16 [B, D, H, cols, PC].
    """
    B, D, H, cols, pc = xp.shape
    assert cin == cout, "in-kernel halo supports the cin == cout res sites"
    assert pc == P * cin and w9.shape == (9, pc, pc), (xp.shape, w9.shape)
    assert P >= 2, "P==1 has no packed halo; use the plain conv"
    halo_full = wl9.shape[1] == pc
    assert wl9.shape == wr9.shape == ((9, pc, cout) if halo_full
                                      else (9, cin, cout)), wl9.shape
    rows_all = H * cols
    # int8 sublane tile is 32: top pad = cols + 32 keeps every in-kernel
    # row offset >= 31 and tile starts 32-aligned when cols % 32 == 0
    top = cols + 32
    if ht is None:
        # VMEM budget: ~16 bytes/row/lane across the 3 double-buffered int8
        # plane tiles, the i32+f32 accumulators and the output — pc=256
        # decoder sites at Ht=64 overflow the ~16 MB VMEM (measured: the
        # Mosaic compile crashes), Ht=32 fits
        ht = max(8, min(64, ((8 << 20) // (16 * pc)) // cols))
    Ht = min(ht, H)
    nH = -(-H // Ht)
    Hp = nH * Ht
    rows_t = Ht * cols
    tile_rows = rows_t + 2 * top

    x2 = xp.reshape(B, D, rows_all, pc)
    x2 = jnp.pad(x2, ((0, 0), (1, 1), (top, top + (Hp - H) * cols), (0, 0)))
    if nH == 1:
        xr = x2.reshape(B * (D + 2), tile_rows, pc)
    else:
        # overlapping y-tiles via one row-gather (see pallas_conv.py: a
        # stack of overlapping slices blows up the XLA:TPU compile)
        idx = (np.arange(nH)[:, None] * rows_t
               + np.arange(tile_rows)[None, :]).reshape(-1)
        xr = jnp.take(x2, jnp.asarray(idx), axis=2)
        xr = xr.reshape(B * (D + 2) * nH, tile_rows, pc)

    if alpha is None:
        alpha = jnp.zeros((pc,), jnp.float32)
    kern = functools.partial(
        _kernel, rows=rows_t, cols=cols, cin=cin, cout=cout, pc=pc,
        act=act, inv_sa=inv_sa, out_int8=out_int8, top=top,
        halo_full=halo_full)

    def plane_spec(k):
        return pl.BlockSpec(
            (1, tile_rows, pc),
            lambda t: (((t // nH) // D * (D + 2) + (t // nH) % D + k) * nH
                       + t % nH, 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(B * D * nH,),
        in_specs=[
            plane_spec(0), plane_spec(1), plane_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w9
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wl9
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wr9
            pl.BlockSpec((1, pc), memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec((1, pc), memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((1, pc), memory_space=pltpu.VMEM),  # alpha
        ],
        out_specs=pl.BlockSpec((1, rows_t, pc), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B * D * nH, rows_t, pc),
            jnp.int8 if out_int8 else jnp.bfloat16),
        interpret=interpret,
    )(xr, xr, xr, w9, wl9, wr9, scale.reshape(1, pc), bias.reshape(1, pc),
      alpha.reshape(1, pc))
    out = out.reshape(B, D, Hp, cols, pc)
    if Hp != H:
        out = out[:, :, :H]
    return out


def reference_i8(xp, mid, wl, wr, scale, bias, alpha=None, *, P, cin,
                 act="relu", inv_sa, out_int8=True):
    """XLA reference (quant.window_conv_packed_i8 + the packed_vnet
    epilogue semantics) for parity tests."""
    from segmentation3d_tpu.ops.quant import window_conv_packed_i8
    acc = window_conv_packed_i8(xp, mid, wl, wr, P=P, cin=cin)
    v = acc.astype(jnp.float32) * scale + bias
    if act == "relu":
        v = jnp.maximum(v, 0.0)
    elif act == "prelu":
        v = jnp.where(v >= 0, v, alpha * v)
    if out_int8:
        return jnp.clip(jnp.round(v * inv_sa), -127, 127).astype(jnp.int8)
    return v.astype(jnp.bfloat16)
