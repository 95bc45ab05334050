"""Coarse-to-fine two-pass throughput (driver config #5): whole-body 512^3
CT, coarse whole-volume pass at 4mm, fine sliding-window only on the organ
ROI. The ROI fraction is synthetic but the compute path is the production
pipeline (`core.coarse_to_fine` math: coarse fwd -> bbox -> fine patches ->
paste). Prints one JSON line (volumes/min/chip).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--coarse_factor", type=int, default=4,
                    help="coarse spacing = this many fine voxels")
    ap.add_argument("--roi", type=int, default=192,
                    help="fine-pass ROI edge (voxels at fine spacing)")
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--stride", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused", type=int, default=1,
                    help="1 (default): packed-domain fused forward; 0: flax")
    ap.add_argument("--quant", default=None, choices=["int8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer

    net = SegmentationNet(in_channels=1, out_channels=args.classes,
                          dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)

    apply_fn = apply_vars = None
    if args.fused:
        from segmentation3d_tpu.models.packed_vnet import build_packed_forward
        apply_fn, apply_vars = build_packed_forward(
            net, variables, dtype=jnp.bfloat16, quant=args.quant)

    rng = np.random.default_rng(0)
    size = args.size
    csize = size // args.coarse_factor
    coarse_vol = jax.device_put(jnp.asarray(
        rng.normal(0, 0.3, (csize, csize, csize, 1)).astype(np.float32)))
    roi = args.roi
    fine_vol = jax.device_put(jnp.asarray(
        rng.normal(0, 0.3, (roi, roi, roi, 1)).astype(np.float32)))

    coarse_inf = SlidingWindowInferer(net, (csize,) * 3, args.classes,
                                      batch_size=1, blend="constant",
                                      apply_fn=apply_fn, apply_vars=apply_vars)
    fine_inf = SlidingWindowInferer(net, (args.patch,) * 3, args.classes,
                                    batch_size=args.batch, blend="gaussian",
                                    apply_fn=apply_fn, apply_vars=apply_vars)
    stride = (args.stride,) * 3

    def one_volume():
        cm = coarse_inf(variables, coarse_vol)           # coarse whole-volume
        fm = fine_inf(variables, fine_vol, stride_zyx=stride)  # fine on ROI
        return cm, fm

    cm, fm = one_volume()
    np.asarray(cm[0, 0, :2]); np.asarray(fm[0, 0, :2])
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        cm, fm = one_volume()
        np.asarray(cm[0, 0, :2]); np.asarray(fm[0, 0, :2])
        ts.append(time.perf_counter() - t0)
    sec = min(ts)
    print(json.dumps({
        "metric": f"{size}^3 coarse-to-fine two-pass ({csize}^3 coarse + "
                  f"{roi}^3 ROI fine {args.patch}^3/stride {args.stride}, bf16)",
        "value": round(60.0 / sec, 2), "unit": "volumes/min/chip",
        "sec_per_volume": round(sec, 3),
    }))


if __name__ == "__main__":
    main()
