"""Device-side fixed-spacing resampling / cropping (TPU-native).

This replaces the reference's host-side ITK resampling — ``crop_image``
(``utils/image_tools.py`` ≈L50-90), ``resample`` (≈L150-180) and
``resample_spacing`` (≈L185-220) — with jitted XLA ops:

- **Separable path** (the common case: source and target share an
  axis-aligned direction): 1-D linear/NN interpolation along each axis is a
  2-sparse matrix; we build the dense ``[out, in]`` interpolation matrix on
  device and apply it as three einsums. On TPU these ride the MXU and are far
  faster than per-voxel gathers.
- **General path** (arbitrary direction matrices): chunked trilinear/NN
  gather over the output volume.

Boundary semantics follow ITK's ``ResampleImageFilter``: sample points whose
continuous source index falls outside ``[0, size-1]`` get the fill (default
pixel) value; linear interpolation never reads out of bounds.

Arrays are ``[D, H, W]`` (= [z, y, x]) or channels-last ``[D, H, W, C]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.ops.geometry import Frame, frame_for_crop, resampled_frame

LINEAR = "LINEAR"
NN = "NN"


def _compose_dst_to_src(src_frame: Frame, dst_frame: Frame) -> np.ndarray:
    """4x4 affine taking dst voxel index (xyz, homogeneous) -> src voxel index."""
    return src_frame.world_to_index_matrix() @ dst_frame.index_to_world_matrix()


def _is_separable(m: np.ndarray, tol: float = 1e-9) -> bool:
    off = m[:3, :3] - np.diag(np.diag(m[:3, :3]))
    return bool(np.all(np.abs(off) <= tol))


# ---------------------------------------------------------------------------
# Separable (axis-aligned) path: interpolation matrices on the MXU
# ---------------------------------------------------------------------------

def _interp_matrix(out_n: int, in_n: int, a, b, interp: str, dtype=jnp.float32):
    """Dense [out_n, in_n] 1-D interpolation matrix for src coord c = a*i + b.

    Rows of out-of-range samples (c outside [0, in_n-1]) are all-zero, which
    realises ITK's default-pixel-value behavior for a zero fill.
    """
    i = jax.lax.broadcasted_iota(dtype, (out_n, in_n), 0)
    j = jax.lax.broadcasted_iota(dtype, (out_n, in_n), 1)
    c = a * i + b
    valid = (c >= 0.0) & (c <= in_n - 1.0)
    if interp == NN:
        idx = jnp.floor(c + 0.5)  # ITK RoundHalfIntegerUp
        w = jnp.where(j == jnp.clip(idx, 0, in_n - 1), 1.0, 0.0)
    else:
        f = jnp.floor(c)
        t = c - f
        w = jnp.where(j == f, 1.0 - t, 0.0) + jnp.where(j == f + 1.0, t, 0.0)
    return jnp.where(valid, w, 0.0).astype(dtype)


def _separable_core(data, coeffs, out_shape, interp=LINEAR, fill=0.0,
                    out_dtype=None):
    """Un-jitted body of :func:`separable_resample` — call this from INSIDE
    an enclosing jit (the fused preprocess/postprocess programs in
    ``core.seg_infer``) so the whole per-case pipeline is ONE program: on the
    remote-compile relay every distinct program costs seconds-to-minutes of
    first-call latency, so program COUNT, not just program cost, matters.

    ``out_dtype``: result dtype (default: ``data``'s dtype — note an int16
    input then yields a rounded int16 result; pass ``jnp.float32`` to
    resample stored-dtype uploads into the model's input domain)."""
    squeeze = data.ndim == 3
    if squeeze:
        data = data[..., None]
    in_shape = data.shape[:3]
    orig_dtype = out_dtype or data.dtype
    x = data.astype(jnp.float32)
    ws = [
        _interp_matrix(out_shape[ax], in_shape[ax], coeffs[ax, 0], coeffs[ax, 1], interp)
        for ax in range(3)
    ]
    # einsum per axis; XLA maps each to an MXU matmul. Interpolation weights
    # need near-f32 accuracy (Dice parity): HIGH = bf16x3 passes reaches
    # ~f32 for these magnitudes at half the cost of HIGHEST (f32 6-pass).
    _ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGH,
                             preferred_element_type=jnp.float32)
    x = _ein("Zd,dhwc->Zhwc", ws[0], x)
    x = _ein("Yh,dhwc->dYwc", ws[1], x)
    x = _ein("Xw,dhwc->dhXc", ws[2], x)
    if fill != 0.0:
        # out-of-range rows produced 0 contribution; add fill where total weight==0
        ones = jnp.ones(in_shape + (1,), jnp.float32)
        cov = _ein("Zd,dhwc->Zhwc", ws[0], ones)
        cov = _ein("Yh,dhwc->dYwc", ws[1], cov)
        cov = _ein("Xw,dhwc->dhXc", ws[2], cov)
        x = x + (1.0 - cov) * fill
    if jnp.issubdtype(orig_dtype, jnp.integer):
        x = jnp.rint(x)
    x = x.astype(orig_dtype)
    return x[..., 0] if squeeze else x


@functools.partial(jax.jit,
                   static_argnames=("out_shape", "interp", "fill", "out_dtype"))
def separable_resample(data, coeffs, out_shape, interp=LINEAR, fill=0.0,
                       out_dtype=None):
    """Resample along each of the three leading axes independently.

    ``coeffs``: array [3, 2] of per-axis (a, b) with src_coord = a*out_idx + b,
    axes ordered (z, y, x).  ``data``: [D,H,W] or [D,H,W,C].
    """
    return _separable_core(data, coeffs, out_shape, interp, fill, out_dtype)


# ---------------------------------------------------------------------------
# General path: chunked trilinear / NN gather
# ---------------------------------------------------------------------------

def _affine_core(data, matrix, out_shape, interp=LINEAR, fill=0.0, z_chunk=8,
                 out_dtype=None):
    """Un-jitted body of :func:`affine_gather_resample` (see
    :func:`_separable_core` for why the split exists)."""
    squeeze = data.ndim == 3
    if squeeze:
        data = data[..., None]
    dz, dy, dx = out_shape
    sz, sy, sx = data.shape[:3]
    x32 = data.astype(jnp.float32)

    nchunk = -(-dz // z_chunk)
    pad_z = nchunk * z_chunk

    def one_chunk(ci):
        z0 = ci * z_chunk
        oz = jax.lax.broadcasted_iota(jnp.float32, (z_chunk, dy, dx), 0) + z0
        oy = jax.lax.broadcasted_iota(jnp.float32, (z_chunk, dy, dx), 1)
        ox = jax.lax.broadcasted_iota(jnp.float32, (z_chunk, dy, dx), 2)
        # dst index xyz -> src index xyz
        cx = matrix[0, 0] * ox + matrix[0, 1] * oy + matrix[0, 2] * oz + matrix[0, 3]
        cy = matrix[1, 0] * ox + matrix[1, 1] * oy + matrix[1, 2] * oz + matrix[1, 3]
        cz = matrix[2, 0] * ox + matrix[2, 1] * oy + matrix[2, 2] * oz + matrix[2, 3]
        valid = ((cx >= 0) & (cx <= sx - 1.0) &
                 (cy >= 0) & (cy <= sy - 1.0) &
                 (cz >= 0) & (cz <= sz - 1.0))

        def gather(zi, yi, xi):
            zi = jnp.clip(zi, 0, sz - 1)
            yi = jnp.clip(yi, 0, sy - 1)
            xi = jnp.clip(xi, 0, sx - 1)
            return x32[zi, yi, xi]  # [z_chunk, dy, dx, C]

        if interp == NN:
            out = gather(jnp.floor(cz + 0.5).astype(jnp.int32),
                         jnp.floor(cy + 0.5).astype(jnp.int32),
                         jnp.floor(cx + 0.5).astype(jnp.int32))
        else:
            fz, fy, fx = jnp.floor(cz), jnp.floor(cy), jnp.floor(cx)
            tz, ty, tx = cz - fz, cy - fy, cx - fx
            fz, fy, fx = fz.astype(jnp.int32), fy.astype(jnp.int32), fx.astype(jnp.int32)
            out = 0.0
            for bz in (0, 1):
                wz = (1 - tz) if bz == 0 else tz
                for by in (0, 1):
                    wy = (1 - ty) if by == 0 else ty
                    for bx in (0, 1):
                        wx = (1 - tx) if bx == 0 else tx
                        w = (wz * wy * wx)[..., None]
                        out = out + w * gather(fz + bz, fy + by, fx + bx)
        return jnp.where(valid[..., None], out, fill)

    chunks = jax.lax.map(one_chunk, jnp.arange(nchunk))
    out = chunks.reshape(pad_z, dy, dx, data.shape[3])[:dz]
    res_dtype = out_dtype or data.dtype
    if jnp.issubdtype(res_dtype, jnp.integer):
        out = jnp.rint(out)
    out = out.astype(res_dtype)
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("out_shape", "interp", "fill",
                                             "z_chunk", "out_dtype"))
def affine_gather_resample(data, matrix, out_shape, interp=LINEAR, fill=0.0,
                           z_chunk=8, out_dtype=None):
    """Resample with a full 3x4 affine (dst xyz index -> src xyz index).

    ``matrix``: [3, 4]; ``data``: [D,H,W] or [D,H,W,C]; output chunked along z
    to bound the coordinate-buffer footprint.
    """
    return _affine_core(data, matrix, out_shape, interp, fill, z_chunk,
                        out_dtype)


# ---------------------------------------------------------------------------
# Frame-level wrappers (host computes the affine, device resamples)
# ---------------------------------------------------------------------------

def resample_plan(src_frame: Frame, dst_frame: Frame, dst_size_xyz):
    """Host-side planning for a frame-to-frame resample: returns
    ``(kind, coeffs, out_shape)`` with ``kind`` in {"sep", "aff"} (static)
    and ``coeffs`` a numpy array to pass as a device ARGUMENT — so one
    compiled program serves every case of the same shape."""
    m = _compose_dst_to_src(src_frame, dst_frame)
    nx, ny, nz = (int(v) for v in dst_size_xyz)
    out_shape = (nz, ny, nx)
    if _is_separable(m):
        # coeffs per output axis (z,y,x): src_axis_coord = a*out_idx + b
        coeffs = np.array([
            [m[2, 2], m[2, 3]],  # z
            [m[1, 1], m[1, 3]],  # y
            [m[0, 0], m[0, 3]],  # x
        ], np.float32)
        return "sep", coeffs, out_shape
    return "aff", np.asarray(m[:3], np.float32), out_shape


def resample_exec(data, kind: str, coeffs, out_shape, interp: str = LINEAR,
                  fill: float = 0.0, out_dtype=None):
    """Execute a :func:`resample_plan`. Trace-inlinable (no inner jit): call
    it inside an enclosing jitted program to fuse resampling with whatever
    surrounds it (normalization, mask packing, ...)."""
    if kind == "sep":
        return _separable_core(jnp.asarray(data), jnp.asarray(coeffs),
                               out_shape, interp, fill, out_dtype)
    return _affine_core(jnp.asarray(data), jnp.asarray(coeffs), out_shape,
                        interp, fill, out_dtype=out_dtype)


def resample_to_frame(data, src_frame: Frame, dst_frame: Frame, dst_size_xyz,
                      interp: str = LINEAR, fill: float = 0.0, out_dtype=None):
    """Resample ``data`` (living in ``src_frame``) onto a target frame/grid.

    Device-side equivalent of the reference's ``image_tools.resample``
    (``utils/image_tools.py`` ≈L150-180). Returns a device array shaped
    ``[nz, ny, nx(, C)]`` for ``dst_size_xyz = (nx, ny, nz)``.
    """
    kind, coeffs, out_shape = resample_plan(src_frame, dst_frame, dst_size_xyz)
    if kind == "sep":
        return separable_resample(jnp.asarray(data), jnp.asarray(coeffs),
                                  out_shape, interp=interp, fill=fill,
                                  out_dtype=out_dtype)
    return affine_gather_resample(jnp.asarray(data), jnp.asarray(coeffs),
                                  out_shape, interp=interp, fill=fill,
                                  out_dtype=out_dtype)


def resample_spacing(data, frame: Frame, new_spacing_xyz, pad_to_multiple: int = 1,
                     interp: str = LINEAR, fill: float = 0.0):
    """Whole-volume resample to a fixed spacing, dims padded up to a multiple
    of ``pad_to_multiple`` (the net's ``max_stride``) — the reference's
    ``resample_spacing`` (``utils/image_tools.py`` ≈L185-220).

    Returns ``(device_array, new_frame, new_size_xyz)``.
    """
    size_xyz = np.asarray(np.shape(data)[:3][::-1] if np.ndim(data) == 3
                          else np.shape(data)[:3][::-1])
    new_frame, new_size = resampled_frame(frame, size_xyz, new_spacing_xyz, pad_to_multiple)
    out = resample_to_frame(data, frame, new_frame, new_size, interp=interp, fill=fill)
    return out, new_frame, new_size


def crop_at_world_center(data, frame: Frame, center_world, out_size_xyz,
                         out_spacing_xyz, interp: str = LINEAR, fill: float = 0.0):
    """Fixed-spacing crop centered on a physical point — the reference's
    ``crop_image`` (``utils/image_tools.py`` ≈L50-90).

    Returns ``(device_array, crop_frame)``.
    """
    crop_frame = frame_for_crop(frame, center_world, out_size_xyz, out_spacing_xyz)
    out = resample_to_frame(data, frame, crop_frame, out_size_xyz, interp=interp, fill=fill)
    return out, crop_frame
