"""Analytic FLOP counts for the V-Net forward (perf accounting).

``vnet_forward_flops`` counts the *useful* dense FLOPs of one forward pass —
the mathematically necessary multiply-adds of the direct convolution
lowering (2 * K^3 * Cin * Cout per output voxel), independent of which
backend actually executes (the window/packed GEMM lowerings inflate the
executed FLOPs by design to win wall-clock; that inflation is overhead, not
useful work, so MFU is defined against THIS count).

Used by ``bench.py`` to report ``useful_tflops_per_s`` and ``mfu`` next to
the volumes/min headline, so a future perf regression is attributable
without re-deriving FLOPs by hand (VERDICT.md round-2 item #7).
"""
from __future__ import annotations

import numpy as np

# Peak dense bf16 matmul throughput of one TPU v5e (v5 lite) chip.
TPU_V5E_PEAK_FLOPS = 197e12


def vnet_forward_flops(patch_zyx, in_channels, out_channels,
                       base_channels=16, down_convs=(1, 2, 3, 3),
                       up_convs=(3, 3, 2, 1)) -> float:
    """Useful FLOPs of ONE V-Net forward on a ``patch_zyx``-shaped patch.

    Counts every conv as 2 * prod(kernel) * Cin * Cout * out_voxels
    (multiply + add), the k=2/s=2 transposed conv as 2 * Cin * Cout per
    OUTPUT voxel (each output voxel reads exactly one input position), and
    ignores BN/activation/softmax (bandwidth-bound elementwise, < 0.1% of
    the total). Architecture mirrors ``models/vnet.py:SegmentationNet``.
    """
    v = float(np.prod(patch_zyx))
    base = int(base_channels)
    total = 2.0 * 27 * in_channels * base * v  # in_block stem

    c = base
    vol = v
    enc = []
    for nconv in down_convs:
        c2 = c * 2
        vol2 = vol / 8.0
        total += 2.0 * 8 * c * c2 * vol2          # k2/s2 down conv
        total += nconv * 2.0 * 27 * c2 * c2 * vol2  # residual convs
        enc.append((c, vol))
        c, vol = c2, vol2
    for nconv in up_convs:
        skip_c, vol_up = enc.pop()
        up = c // 2
        total += 2.0 * c * up * vol_up            # k2/s2 deconv (1 tap/output)
        # res convs run on the concat (up + skip_c == c) at full feature width
        total += nconv * 2.0 * 27 * c * c * vol_up
        c, vol = c // 2, vol_up
    # out_block: 3^3 conv (2*base -> nc) + 1x1x1 projection (nc -> nc)
    total += 2.0 * 27 * (2 * base) * out_channels * v
    total += 2.0 * out_channels * out_channels * v
    return total


def vnet_train_step_flops(patch_zyx, in_channels, out_channels,
                          batch: int = 1, **net_kwargs) -> float:
    """Useful FLOPs of ONE training step (fwd + bwd) on ``batch`` patches.

    Standard dense accounting: backward costs ~2x the forward (one
    matmul-shaped pass for the activation cotangents, one for the weight
    gradients), so a step is 3x the forward. Rematerialization re-executes
    the forward inside backward — that extra forward is overhead, not
    useful work, so MFU under ``remat=True`` is defined against this same
    3x count (executed/useful ~ 4/3)."""
    return 3.0 * batch * vnet_forward_flops(
        patch_zyx, in_channels, out_channels, **net_kwargs)


def sliding_window_flops(volume_zyx, patch_zyx, stride_zyx, in_channels,
                         out_channels, **net_kwargs) -> float:
    """Useful FLOPs of a whole sliding-window pass: per-patch forward FLOPs
    times the number of boxes the engine runs (overlap re-computation is
    counted as useful — the blending algorithm requires those voxels)."""
    from segmentation3d_tpu.ops.geometry import partition_boxes
    boxes = partition_boxes(np.asarray(volume_zyx)[::-1],
                            np.asarray(patch_zyx)[::-1],
                            np.asarray(stride_zyx)[::-1])
    return len(boxes) * vnet_forward_flops(patch_zyx, in_channels,
                                           out_channels, **net_kwargs)
