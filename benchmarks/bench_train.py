"""Training-throughput benchmark (driver config #3): device-side
resample->normalize->crop pipeline + jitted train step, 3-class, batch 8.

Prints one JSON line: {"metric": ..., "value": patches/sec, ...}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--conv_backend", default="direct",
                    choices=["direct", "window", "packed_domain"])
    ap.add_argument("--remat", type=int, default=1,
                    help="jax.checkpoint per level (1, the train-loop "
                         "default) vs full activation storage (0)")
    ap.add_argument("--profile_dir", default=None,
                    help="jax.profiler trace dir (wraps the timed steps)")
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="K>1 fuses K train steps into one program "
                         "(make_multi_train_step) — amortizes the ~20 ms "
                         "relay dispatch; args.steps must divide by K")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.losses import MultiDiceLoss
    from segmentation3d_tpu.core.seg_train import make_train_step
    from segmentation3d_tpu.dataloader import SegmentationDataset
    from segmentation3d_tpu.parallel import make_mesh, replicate, shard_batch
    from segmentation3d_tpu.utils.normalizer import FixedNormalizer
    from segmentation3d_tpu.io import Volume, write_image
    from segmentation3d_tpu.ops.geometry import Frame
    import tempfile

    # synthetic organ-CT-like cases on disk (exercises the real host->device
    # pipeline: file read, fixed-spacing crop, normalize, batch, shard)
    tmp = tempfile.mkdtemp(prefix="bench_train_")
    rng = np.random.default_rng(0)
    ims, segs = [], []
    shape = (160, 192, 192)
    frame = Frame.identity(spacing=(1.0, 1.0, 2.0))
    for i in range(args.cases):
        img = rng.normal(-300, 300, size=shape).astype(np.float32)
        seg = np.zeros(shape, np.uint8)
        seg[40:100, 60:140, 60:140] = 1
        seg[60:80, 80:120, 80:120] = 2
        ip = os.path.join(tmp, f"c{i}.nii.gz")
        sp = os.path.join(tmp, f"c{i}_seg.nii.gz")
        write_image(Volume(img, frame), ip)
        write_image(Volume(seg, frame), sp)
        ims.append([ip])
        segs.append(sp)

    ds = SegmentationDataset(
        imseg_list=(ims, segs), num_classes=args.classes, spacing=(1, 1, 1),
        crop_size=(args.crop,) * 3, sampling_method="MASK",
        random_translation=(5, 5, 5),
        crop_normalizers=[FixedNormalizer(-300.0, 600.0)], random_flip=True)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # 'packed_domain' is a train-step apply_fn (models/packed_train.py), not a
    # per-conv module backend — mirror core.seg_train.train's wiring
    module_backend = "direct" if args.conv_backend == "packed_domain" \
        else args.conv_backend
    net = SegmentationNet(in_channels=1, out_channels=args.classes, dtype=dtype,
                          remat=bool(args.remat), conv_backend=module_backend)
    x0 = jnp.zeros((1, args.crop, args.crop, args.crop, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    optimizer = optax.adam(1e-4)
    mesh = make_mesh(-1)
    params = replicate(variables["params"], mesh)
    stats = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(optimizer.init(variables["params"]), mesh)
    loss_fn = MultiDiceLoss(num_class=args.classes)
    apply_fn, packed_loss = None, None
    if args.conv_backend == "packed_domain":
        from segmentation3d_tpu.models.packed_train import build_packed_train_apply
        from segmentation3d_tpu.losses.packed import make_packed_loss
        packed_loss = make_packed_loss(loss_fn, None, args.classes)
        apply_fn = build_packed_train_apply(
            net, packed_probs=packed_loss is not None)
    step = make_train_step(net, loss_fn, optimizer, apply_fn=apply_fn,
                           packed_loss=packed_loss)
    K = max(1, args.steps_per_dispatch)
    if K > 1:
        assert args.steps % K == 0, "--steps must divide by K"
        from segmentation3d_tpu.core.seg_train import make_multi_train_step
        multi = make_multi_train_step(net, loss_fn, optimizer, K,
                                      apply_fn=apply_fn,
                                      packed_loss=packed_loss)

    # the REAL train loop's background prefetcher (crop/normalize batch b+1
    # while the device runs step b) — without it this measured the host
    # batch-assembly time IN SERIES with the device step (23.2 vs the true
    # ~44 patches/sec at 96^3, measured round 3)
    from segmentation3d_tpu.core.seg_train import _BatchPrefetcher

    def index_stream(n):
        for _ in range(n):
            yield int(rng.integers(0, len(ds)))

    warm = _BatchPrefetcher(ds, index_stream(args.batch * max(1, K)),
                            args.batch, mesh, depth=K + 1)
    if K > 1:
        group = [next(warm) for _ in range(K)]
        params, stats, opt_state, losses = multi(
            params, stats, opt_state,
            *[b[0] for b in group], *[b[1] for b in group])
        float(losses[-1])  # warm-up/compile
    else:
        im, sg, _, _ = next(warm)
        params, stats, opt_state, loss = step(params, stats, opt_state, im, sg)
        float(loss)  # warm-up/compile
    warm.stop()

    prefetcher = _BatchPrefetcher(
        ds, index_stream(args.steps * args.batch), args.batch, mesh,
        depth=K + 1)
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    if K > 1:
        it = iter(prefetcher)
        for _ in range(args.steps // K):
            group = [next(it) for _ in range(K)]
            params, stats, opt_state, losses = multi(
                params, stats, opt_state,
                *[b[0] for b in group], *[b[1] for b in group])
        float(losses[-1])
    else:
        for im, sg, _, _ in prefetcher:
            params, stats, opt_state, loss = step(
                params, stats, opt_state, im, sg)
        float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    if args.profile_dir:
        jax.profiler.stop_trace()
    pps = args.batch / dt
    from segmentation3d_tpu.utils.flops import (
        vnet_train_step_flops, TPU_V5E_PEAK_FLOPS)
    step_flops = vnet_train_step_flops(
        (args.crop,) * 3, 1, args.classes, batch=args.batch)
    tfs = step_flops / dt / 1e12
    mfu = step_flops / dt / TPU_V5E_PEAK_FLOPS
    print(json.dumps({
        "metric": f"train pipeline throughput ({args.crop}^3 crops, "
                  f"{args.classes}-class, batch {args.batch}, {args.dtype}, "
                  f"{args.conv_backend} convs)",
        "value": round(pps, 2), "unit": "patches/sec",
        "sec_per_step": round(dt, 4), "remat": bool(args.remat),
        "useful_tflops_per_s": round(tfs, 1), "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
