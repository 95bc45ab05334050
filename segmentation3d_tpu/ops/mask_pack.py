"""Device-side label-mask bit packing for cheap device->host transfer.

The axon/PJRT link moves ~20-25 MB/s in this environment (measured,
`benchmarks/bench_e2e.py` profiling): pulling a 384^3 label mask back as
int32 costs ~9.4 s, as uint8 ~2.3 s. Packing the mask to the minimal bit
width ON DEVICE (1 bit for binary, 2 bits for <=4 classes, 4 bits for <=16)
cuts the transfer a further 2-8x; the host side unpacks with numpy in tens
of milliseconds. The reference has no analog (its masks stay on the GPU
host's local RAM); this is purely a TPU-host-link optimization.

``pack_mask`` runs under jit (pure jnp); ``unpack_mask`` is host numpy.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bits_for(num_classes: int) -> int:
    """Minimal power-of-2 bit width that can hold labels 0..num_classes-1."""
    for b in (1, 2, 4):
        if num_classes <= (1 << b):
            return b
    return 8


def pack_mask(mask, num_classes: int):
    """Pack an integer label array's LAST axis to ``bits_for(num_classes)``
    bits per voxel. Returns a uint8 array whose last axis is
    ``ceil(n * bits / 8)``. Pure jnp — safe inside jit; runs on device so
    only the packed bytes cross the host link.
    """
    bits = bits_for(num_classes)
    m = jnp.asarray(mask).astype(jnp.uint8)
    if bits == 8:
        return m
    vpb = 8 // bits  # voxels per byte
    n = m.shape[-1]
    pad = (-n) % vpb
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    g = m.reshape(m.shape[:-1] + (m.shape[-1] // vpb, vpb))
    # voxel i of a byte occupies the HIGH bits first (np.packbits 'big' order)
    shifts = jnp.arange(vpb - 1, -1, -1, dtype=jnp.uint8) * np.uint8(bits)
    return (g << shifts).sum(axis=-1, dtype=jnp.uint8)


_UNPACK_LUT = {}  # bits -> [256, vpb] uint8 (byte value -> its voxel labels)


def unpack_mask(packed: np.ndarray, n_last: int, num_classes: int) -> np.ndarray:
    """Host-side inverse of :func:`pack_mask`: uint8 packed bytes ->
    uint8 labels with last axis ``n_last``.

    Uses ``np.unpackbits`` (1-bit) / a 256-entry byte lookup table (2/4-bit)
    — the broadcast ``(p[..., None] >> shifts) & m`` formulation profiled at
    2.9 s for a 384^3 binary mask on this 1-core host (it materialized an
    8x uint8 intermediate), which serialized into the write-behind thread's
    per-case budget."""
    bits = bits_for(num_classes)
    p = np.asarray(packed, np.uint8)
    if bits == 8:
        return p[..., :n_last]
    vpb = 8 // bits
    if bits == 1:
        g = np.unpackbits(p, axis=-1)  # 'big' order == pack_mask's layout
    else:
        from segmentation3d_tpu import native
        g = native.unpack_bits(p, bits)  # one C pass when available
        if g is not None:
            return g[..., :n_last]
        lut = _UNPACK_LUT.get(bits)
        if lut is None:
            shifts = (np.arange(vpb - 1, -1, -1, np.uint8) * np.uint8(bits))
            lut = ((np.arange(256, dtype=np.uint8)[:, None] >> shifts)
                   & np.uint8((1 << bits) - 1))
            _UNPACK_LUT[bits] = lut
        g = lut[p].reshape(p.shape[:-1] + (p.shape[-1] * vpb,))
    return g[..., :n_last]
