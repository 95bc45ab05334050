"""Reference-named geometric API (``segmentation3d/utils/image_tools.py``).

Thin parity layer exposing the reference's free-function surface (SURVEY.md
C7) on top of the TPU-native ops in :mod:`segmentation3d_tpu.ops`. A
"Volume" here plays the role the reference gives ``SimpleITK.Image``:
``data [z,y,x]`` + ``Frame``.

Functions mirrored: ``get_image_frame`` / ``set_image_frame`` (≈L10-40),
``crop_image`` (≈L50-90), ``convert_image_to_tensor`` /
``convert_tensor_to_image`` (≈L95-140), ``resample`` (≈L150-180),
``resample_spacing`` (≈L185-220), ``image_partition_by_fixed_size``
(≈L230-280), ``pick_largest_connected_component`` (≈L290-320),
``remove_small_connected_component`` (≈L325-355), ``copy_image`` (≈L360-380).
"""
from __future__ import annotations

import numpy as np

from segmentation3d_tpu.io import Volume
from segmentation3d_tpu.ops import geometry, resample as _rs
from segmentation3d_tpu.ops.components import (  # noqa: F401 (re-export)
    pick_largest_connected_component, remove_small_connected_component,
)
from segmentation3d_tpu.ops.geometry import Frame


def get_image_frame(vol: Volume) -> Frame:
    return vol.frame


def set_image_frame(vol: Volume, frame: Frame) -> Volume:
    vol.frame = frame
    return vol


def crop_image(vol: Volume, center_world, crop_size_xyz, crop_spacing_xyz,
               interpolation: str = "LINEAR", fill: float = 0.0) -> Volume:
    """Fixed-spacing crop centered on a physical point."""
    data, frame = _rs.crop_at_world_center(
        vol.data, vol.frame, center_world, crop_size_xyz, crop_spacing_xyz,
        interp=interpolation, fill=fill)
    return Volume(np.asarray(data), frame)


def resample(vol: Volume, target_frame: Frame, target_size_xyz,
             interpolation: str = "LINEAR", fill: float = 0.0) -> Volume:
    """Resample onto an arbitrary target frame/grid."""
    data = _rs.resample_to_frame(vol.data, vol.frame, target_frame,
                                 target_size_xyz, interp=interpolation, fill=fill)
    return Volume(np.asarray(data), target_frame)


def resample_spacing(vol: Volume, spacing_xyz, max_stride: int = 1,
                     interpolation: str = "LINEAR", fill: float = 0.0) -> Volume:
    """Whole-volume resample to fixed spacing, dims padded to x ``max_stride``."""
    data, frame, _ = _rs.resample_spacing(vol.data, vol.frame, spacing_xyz,
                                          pad_to_multiple=max_stride,
                                          interp=interpolation, fill=fill)
    return Volume(np.asarray(data), frame)


def image_partition_by_fixed_size(vol: Volume, partition_size_xyz,
                                  partition_stride_xyz, max_stride: int = 1):
    """Overlapping sliding-window boxes; returns list of (start_xyz, end_xyz)."""
    size = np.asarray(partition_size_xyz, np.int64)
    if max_stride > 1:
        size = (np.ceil(size / max_stride) * max_stride).astype(np.int64)
    starts = geometry.partition_boxes(vol.size_xyz, size, partition_stride_xyz)
    return [(s, s + size) for s in starts]


def convert_image_to_tensor(vol_or_list):
    """Volume(s) -> channels-last jnp array [D,H,W,C] ([B,...] for lists of
    equal-shape volumes is the caller's stack)."""
    import jax.numpy as jnp
    if isinstance(vol_or_list, (list, tuple)):
        return jnp.stack([jnp.asarray(v.data) for v in vol_or_list], axis=-1)
    return jnp.asarray(vol_or_list.data)[..., None]


def convert_tensor_to_image(tensor, frame: Frame, dtype=None):
    """Channels-last array -> Volume(s) (one per channel if C > 1)."""
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        vols = [Volume(arr[..., c].astype(dtype) if dtype else arr[..., c], frame)
                for c in range(arr.shape[-1])]
        return vols[0] if len(vols) == 1 else vols
    return Volume(arr.astype(dtype) if dtype else arr, frame)


def copy_image(vol: Volume) -> Volume:
    return Volume(np.array(vol.data, copy=True), vol.frame)
