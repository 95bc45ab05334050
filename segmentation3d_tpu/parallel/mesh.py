"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``core/seg_train.py`` ≈L95, driven by ``cfg.general.num_gpus`` — SURVEY.md
P1/P2). The TPU-native replacement is first-class SPMD: a 1-D ``data`` mesh
over ICI, params replicated, batch sharded, gradient ``psum`` inserted by XLA
under ``jit``. The same mesh batches sliding-window patches across chips at
inference. ``cfg.general.num_gpus`` maps onto the mesh size (``-1``/0 = all
local devices), so reference configs scale unmodified.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, devices=None, spatial: int = 1) -> Mesh:
    """Data-parallel mesh over the first ``num_devices`` local devices.

    ``spatial > 1`` builds a 2-D ``(data, spatial)`` mesh instead: the crop
    z-axis is sharded ``spatial``-ways during training (GSPMD inserts the
    conv halo exchanges and the cross-shard BN/loss reductions), so crops
    too large for one chip's HBM train across the mesh — the training-side
    analog of :mod:`segmentation3d_tpu.core.spatial_shard`'s inference mode
    (SURVEY §5 long-context row). ``num_devices`` stays the TOTAL device
    count and must divide by ``spatial``."""
    if devices is None:
        devices = jax.devices()
    if num_devices is None or num_devices <= 0:
        num_devices = len(devices)
    num_devices = min(num_devices, len(devices))
    spatial = max(1, int(spatial))
    if spatial > 1:
        if num_devices % spatial != 0:
            raise ValueError(
                f"{num_devices} device(s) do not divide over a spatial "
                f"mesh axis of {spatial}")
        arr = np.asarray(devices[:num_devices]).reshape(
            num_devices // spatial, spatial)
        return Mesh(arr, ("data", "spatial"))
    return Mesh(np.asarray(devices[:num_devices]), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharding: leading dim split over ``data``; on a 2-D
    ``(data, spatial)`` mesh the second dim (crop z) splits over
    ``spatial`` too."""
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Fully-replicated placement of a pytree over the mesh.

    Multi-process meshes (a mesh spanning non-addressable devices) go
    through ``make_array_from_callback`` — every process holds the same
    host value (seeded init / broadcast), so the callback never moves data
    across hosts."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def mk(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(mk, tree)


def shard_batch(tree, mesh: Mesh):
    """Place batch arrays with their leading axis sharded over ``data``
    (single-process path: the caller holds the whole global batch)."""
    sharding = data_sharding(mesh)
    return jax.device_put(tree, sharding)


def make_global_batch(local_tree, mesh: Mesh, global_batch_size: int):
    """Globally-sharded batch from this process's LOCAL rows.

    The multi-host data path (SURVEY P2): each process assembles only the
    ``global_batch // process_count`` rows its own devices consume, and
    ``jax.make_array_from_process_local_data`` stitches them into one
    global array — no host ever materializes the full batch and no
    cross-host copy happens. Degrades to :func:`shard_batch` (identical
    placement) when single-process."""
    if jax.process_count() == 1:
        return shard_batch(local_tree, mesh)
    sharding = data_sharding(mesh)

    def mk(x):
        x = np.asarray(x)  # device-side crops come back to host once
        gshape = (global_batch_size,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, gshape)
    return jax.tree_util.tree_map(mk, local_tree)


def pad_batch_to_devices(n: int, num_devices: int) -> int:
    """Smallest multiple of num_devices >= n (batch must divide evenly)."""
    return -(-n // num_devices) * num_devices
