"""Elastic deformation augmentation — device-side coarse-grid warp.

Depth beyond the reference (SURVEY.md C5 lists flip as its only spatial
augmentation): a random displacement field is drawn on a coarse control-
point grid, trilinearly upsampled to the crop shape on device, and applied
as a gather resample — smooth, invertibility-friendly warps like the
classic B-spline/elastic augmentations of medical segmentation pipelines.

TPU shape discipline (CLAUDE.md: program COUNT is a first-order cost):
ONE jitted program per (crop shape, grid shape); the random control-point
displacements ride in as a device ARRAY argument, never as trace
constants, so every training step reuses the same compiled warp. The
label crop is warped with nearest-neighbor sampling of the SAME
displacement field, so image/label consistency is exact by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def elastic_warp(image, seg, disp):
    """Warp an image crop and its label crop with one displacement field.

    ``image``: [D,H,W,C] float; ``seg``: [D,H,W] integer; ``disp``:
    [gz,gy,gx,3] control-point displacements in VOXELS (z,y,x order in the
    last axis), any coarse grid size >= 2 per axis. Returns
    ``(warped_image, warped_seg)``. Sample coordinates are clamped to the
    crop (edge replication — no fill labels are invented)."""
    D, H, W = seg.shape
    dense = jax.image.resize(disp.astype(jnp.float32), (D, H, W, 3),
                             method="trilinear")
    cz = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 0) + dense[..., 0]
    cy = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 1) + dense[..., 1]
    cx = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 2) + dense[..., 2]
    cz = jnp.clip(cz, 0.0, D - 1.0)
    cy = jnp.clip(cy, 0.0, H - 1.0)
    cx = jnp.clip(cx, 0.0, W - 1.0)

    img32 = image.astype(jnp.float32)

    def gather_img(zi, yi, xi):
        return img32[jnp.clip(zi, 0, D - 1), jnp.clip(yi, 0, H - 1),
                     jnp.clip(xi, 0, W - 1)]

    fz, fy, fx = jnp.floor(cz), jnp.floor(cy), jnp.floor(cx)
    tz, ty, tx = cz - fz, cy - fy, cx - fx
    fz = fz.astype(jnp.int32)
    fy = fy.astype(jnp.int32)
    fx = fx.astype(jnp.int32)
    out = 0.0
    for bz in (0, 1):
        wz = (1 - tz) if bz == 0 else tz
        for by in (0, 1):
            wy = (1 - ty) if by == 0 else ty
            for bx in (0, 1):
                wx = (1 - tx) if bx == 0 else tx
                w = (wz * wy * wx)[..., None]
                out = out + w * gather_img(fz + bz, fy + by, fx + bx)
    warped_image = out.astype(image.dtype)

    # labels: nearest sample of the SAME field (label-preserving)
    nz = jnp.floor(cz + 0.5).astype(jnp.int32)
    ny = jnp.floor(cy + 0.5).astype(jnp.int32)
    nx = jnp.floor(cx + 0.5).astype(jnp.int32)
    warped_seg = seg[jnp.clip(nz, 0, D - 1), jnp.clip(ny, 0, H - 1),
                     jnp.clip(nx, 0, W - 1)]
    return warped_image, warped_seg
