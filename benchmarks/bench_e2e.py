"""END-TO-END inference throughput: real files on disk -> written masks.

Unlike ``bench.py`` (device-only sliding-window throughput on a pre-staged
volume), this measures the FULL ``segmentation()`` path of SURVEY.md §3.2 on
actual .nii.gz files: read + resample_spacing + normalize + sliding-window
forward/blend + resample-back + connected components (optional) + write,
with ``_ReadAhead`` overlapping host I/O of case N+1 with device compute of
case N. This is the number the ≥20 volumes/min north-star implies for a
production stream of volumes.

Usage (TPU):
    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_e2e.py \
        --native 384 --cases 4
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_case(path, shape_zyx, spacing_xyz, seed):
    """A CT-like volume with soft-tissue texture (gzip-realistic entropy).

    Stored as int16 — the dtype real CT volumes use on disk. The pipeline
    uploads the STORED dtype and casts to f32 on device, so this halves the
    host->device bytes vs a float32 file (the realistic case)."""
    from segmentation3d_tpu.io import Volume, write_image
    from segmentation3d_tpu.ops.geometry import Frame
    rng = np.random.default_rng(seed)
    d, h, w = shape_zyx
    vol = rng.normal(40.0, 120.0, (d, h, w))
    z, y, x = np.mgrid[0:d, 0:h, 0:w]
    r2 = ((z - d / 2) ** 2 + (y - h / 2) ** 2 + (x - w / 2) ** 2)
    vol += np.where(r2 < (0.3 * min(d, h, w)) ** 2, 160.0, -80.0)
    vol = np.clip(np.round(vol), -1024, 3071).astype(np.int16)
    write_image(Volume(vol, Frame.identity(spacing=spacing_xyz)), path)
    return path


def build_model_dir(save_dir, spacing, num_classes=2):
    """Write a self-describing checkpoint with random weights (forward cost
    is weight-independent; this benchmarks the pipeline, not Dice)."""
    import jax
    import jax.numpy as jnp
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.utils import model_io
    from segmentation3d_tpu.utils.normalizer import FixedNormalizer
    net = SegmentationNet(in_channels=1, out_channels=num_classes)
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)), train=False))
    model_io.save_checkpoint(
        save_dir, 0, 0, variables, net_name="vnet", max_stride=16,
        in_channels=1, out_channels=num_classes, spacing=spacing,
        interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(mean=40.0, stddev=350.0)])
    return save_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--native", type=int, default=384,
                    help="native volume size (cubic); at --spacing_native vs "
                         "--spacing_model this resamples to the model grid")
    ap.add_argument("--spacing_native", type=float, default=1.0)
    ap.add_argument("--spacing_model", type=float, default=0.75,
                    help="384^3 @1.0mm -> 512^3 @0.75mm model grid (the "
                         "512^3 headline shape after resample_spacing)")
    ap.add_argument("--slab", type=int, default=64)
    ap.add_argument("--slab_stride", type=int, default=56)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--keep", default=None, help="keep work dir at this path")
    ap.add_argument("--post", default=None, choices=[None, "largest_cc"])
    args = ap.parse_args()

    import jax.numpy as jnp
    from segmentation3d_tpu.core.seg_infer import segmentation

    work = args.keep or tempfile.mkdtemp(prefix="bench_e2e_")
    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir, exist_ok=True)
    spacing = [args.spacing_model] * 3
    print(f"synthesizing {args.cases} x {args.native}^3 cases "
          f"(~{args.native ** 3 * 4 / 1e9:.1f} GB raw each) ...", flush=True)
    for i in range(args.cases):
        synth_case(os.path.join(data_dir, f"case{i}.nii.gz"),
                   (args.native,) * 3, [args.spacing_native] * 3, seed=i)
    model_dir = build_model_dir(os.path.join(work, "model"), spacing)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    post = {"type": "largest_cc"} if args.post else None

    # warm-up on one case (compile + cache)
    out0 = os.path.join(work, "warmup")
    segmentation(os.path.join(data_dir, "case0.nii.gz"), model_dir, out0,
                 seg_name="seg.nii.gz", partition_type="SLAB",
                 partition_size=[args.slab] * 3,
                 partition_stride=[args.slab_stride] * 3,
                 dtype=dtype, post_processing=post)

    out = os.path.join(work, "out")
    t0 = time.perf_counter()
    results = segmentation(data_dir, model_dir, out, seg_name="seg.nii.gz",
                           partition_type="SLAB", partition_size=[args.slab] * 3,
                           partition_stride=[args.slab_stride] * 3,
                           dtype=dtype, post_processing=post)
    wall = time.perf_counter() - t0
    assert len(results) == args.cases
    per_case = [r[1] for r in results]
    vols_per_min = 60.0 * args.cases / wall
    print(json.dumps({
        "metric": f"end-to-end file->mask throughput ({args.cases} x "
                  f"{args.native}^3 native .nii.gz, model grid "
                  f"{args.spacing_model}mm, SLAB {args.slab}/{args.slab_stride}, "
                  f"{args.dtype})",
        "value": round(vols_per_min, 3),
        "unit": "volumes/min/chip",
        "wall_s": round(wall, 2),
        "per_case_s": [round(s, 2) for s in per_case],
        "vs_baseline": round(vols_per_min / 20.0, 3),
    }))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
