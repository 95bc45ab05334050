"""VB-Net registry entry: the bottleneck-block V-Net.

The reference's ``segmentation3d/network/vnet.py`` ships the bottleneck
conv blocks (``BottConvBnRelu3``/``BottResidualBlock3``, ≈L35-125) next to
the plain ones, and the same author's toolkits register the
bottleneck-block network under the name ``vbnet``. This module makes
``cfg.net.name = 'vbnet'`` (and checkpoints recording ``net: 'vbnet'``)
resolve through the string registry (``models.get_network_module``) to the
bottleneck variant of :class:`~segmentation3d_tpu.models.vnet.SegmentationNet`
— identical parameter-tree naming, so checkpoint I/O, torch import, and
every conv backend behave exactly as for ``'vnet'``.
"""
from __future__ import annotations

import functools

from segmentation3d_tpu.models.vnet import (
    SegmentationNet as _VNet, max_stride, vnet_focal_init)

__all__ = ["SegmentationNet", "max_stride", "vnet_focal_init"]

# flax modules are dataclasses: a partial with bottleneck=True is the
# module constructor with a different default (still overridable).
SegmentationNet = functools.partial(_VNet, bottleneck=True)
