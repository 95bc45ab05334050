"""Driver acceptance config #4: 4-channel BraTS-style V-Net, 4-class, 128^3.

Measures (a) the fused inference forward at [B,128,128,128,4] (ms/patch) and
(b) a full sliding-window pass over a BraTS-sized 4-modality volume
(160x240x240 @1mm, 128^3 patches, stride 96), with adaptive-normalizer
preprocessing on device. Prints one JSON line per measurement.

Usage (TPU):
    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_multimodality.py
"""
import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--stride", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--quant", default=None, choices=["int8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.packed_vnet import build_packed_forward
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
    from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    net = SegmentationNet(in_channels=4, out_channels=4, dtype=dtype)
    x0 = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    apply_fn, fused_vars = build_packed_forward(net, variables, dtype=dtype,
                                                quant=args.quant)

    rng = np.random.default_rng(0)
    p = args.patch

    # (a) raw fused forward ms/patch at batch
    xb = jax.device_put(jnp.asarray(
        rng.normal(size=(args.batch, p, p, p, 4)), jnp.float32).astype(dtype))
    fwd = jax.jit(lambda v, x: apply_fn(v, x, train=False))
    fused_vars = jax.device_put(fused_vars)
    out = fwd(fused_vars, xb)
    np.asarray(out[0, 0, 0, 0])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fwd(fused_vars, xb)
        np.asarray(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    ms_patch = min(times) / args.batch * 1e3
    print(json.dumps({
        "metric": f"4-chan 4-class V-Net fused forward ({p}^3, batch "
                  f"{args.batch}, {args.dtype})",
        "value": round(ms_patch, 2), "unit": "ms/patch"}), flush=True)

    # (b) full sliding-window over a BraTS-sized 4-modality volume, with
    # per-modality adaptive normalization on device
    shape = (160, 240, 240)
    vol = rng.normal(0.0, 1.0, size=shape + (4,)).astype(np.float32)
    vol[40:120, 60:180, 60:180] += 3.0
    normalizers = [AdaptiveNormalizer() for _ in range(4)]
    t_host0 = time.perf_counter()
    chans = [normalizers[c](vol[..., c]) for c in range(4)]
    vol_n = jax.device_put(jnp.stack(
        [jnp.asarray(c) for c in chans], axis=-1))
    vol_n.block_until_ready()
    norm_s = time.perf_counter() - t_host0

    inferer = SlidingWindowInferer(net, (p, p, p), 4, batch_size=args.batch,
                                   blend="gaussian", apply_fn=apply_fn,
                                   apply_vars=fused_vars)
    stride = (args.stride,) * 3
    seg = inferer(variables, vol_n, stride_zyx=stride)
    np.asarray(seg[0, :2, 0])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        seg = inferer(variables, vol_n, stride_zyx=stride)
        np.asarray(seg[0, :2, 0])
        times.append(time.perf_counter() - t0)
    sec = min(times)
    n_boxes = len(inferer.boxes_for(shape, stride))
    print(json.dumps({
        "metric": f"BraTS-style 4-chan sliding-window ({shape[0]}x{shape[1]}x"
                  f"{shape[2]}, {p}^3 patches stride {args.stride}, "
                  f"{n_boxes} patches, {args.dtype}; adaptive-norm "
                  f"{norm_s*1e3:.0f} ms host+stage)",
        "value": round(60.0 / sec, 2), "unit": "volumes/min/chip",
        "sec_per_volume": round(sec, 3)}), flush=True)


if __name__ == "__main__":
    main()
