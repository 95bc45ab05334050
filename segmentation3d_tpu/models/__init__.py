"""Model registry.

The reference loads networks **by name via importlib**
(``core/seg_train.py`` ≈L90: ``importlib('segmentation3d.network.' + cfg.net.name)``),
so configs say ``__C.net.name = 'vnet'``. We keep the same string-registry
contract: a model module must expose ``SegmentationNet`` and ``max_stride()``.
"""
from __future__ import annotations

import importlib


def get_network_module(name: str):
    """Resolve ``cfg.net.name`` -> model module (e.g. ``'vnet'``)."""
    return importlib.import_module(f"segmentation3d_tpu.models.{name}")


def create_network(name: str, in_channels: int, out_channels: int, **kwargs):
    mod = get_network_module(name)
    return mod.SegmentationNet(in_channels=in_channels, out_channels=out_channels, **kwargs)


def max_stride_of(name: str) -> int:
    return get_network_module(name).max_stride()
