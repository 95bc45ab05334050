"""In-training validation save-point cost (BASELINE.md round-4/5 rows).

Round-4 measured 34.8 s per warm save point for ONE 320^3 case — dominated
by the full int-mask D2H over the slow relay direction plus eager
preprocess dispatches. Round-5 moved scoring on device
(``SlidingWindowInferer.dice``: 2*(NC-1) floats cross the link) and routed
preprocessing through the drivers' fused programs; this script measures
the before/after directly.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_validation.py
"""
import argparse
import os
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size_cap", type=int, default=256)
    ap.add_argument("--slab_z", type=int, default=64)
    args = ap.parse_args()

    import jax.numpy as jnp
    import jax
    from segmentation3d_tpu.core.validation import validate_cases
    from segmentation3d_tpu.io import Volume, write_image
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.ops.geometry import Frame

    s = args.size
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        z, y, x = np.mgrid[0:s, 0:s, 0:s]
        c = s / 2.0
        seg = (((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
               < (0.3 * s) ** 2).astype(np.uint8)
        img = np.where(seg > 0, 200.0, -100.0).astype(np.float32)
        img += rng.normal(0, 5.0, img.shape).astype(np.float32)
        ip = os.path.join(td, "img.nii.gz")
        sp = os.path.join(td, "seg.nii.gz")
        write_image(Volume(img, Frame.identity()), ip)
        write_image(Volume(seg, Frame.identity()), sp)
        lst = os.path.join(td, "val.txt")
        open(lst, "w").write(f"1\n{ip}\n{sp}\n")

        net = SegmentationNet(in_channels=1, out_channels=2,
                              dtype=jnp.bfloat16)
        variables = jax.device_get(net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)),
            train=False))

        cache = {}
        kw = dict(spacing=[1.0, 1.0, 1.0], interpolation="LINEAR",
                  normalizers=[None], num_classes=2, max_stride=16,
                  shape_bucket=32, inferer_cache=cache,
                  size_cap=args.size_cap, slab_z=args.slab_z)
        t0 = time.perf_counter()
        mean, per_class, n = validate_cases(net, variables, lst, **kw)
        cold = time.perf_counter() - t0
        print(f"cold save point: {cold:.1f} s (dice {mean:.4f}, {n} case)")
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            mean, per_class, n = validate_cases(net, variables, lst, **kw)
            times.append(time.perf_counter() - t0)
            print(f"warm save point {r}: {times[-1]:.2f} s "
                  f"(dice {mean:.4f})")
        ninf = len([k for k in cache if isinstance(k, tuple)])
        print(f"warm min {min(times):.2f} s / median "
              f"{sorted(times)[len(times) // 2]:.2f} s; cached inferers "
              f"{ninf} (round-4 baseline: 34.8 s/save point)")


if __name__ == "__main__":
    main()
