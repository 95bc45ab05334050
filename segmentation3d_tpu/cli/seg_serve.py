"""``seg_serve`` console script — warm-session production serving.

Beyond the reference (whose deployment unit is one ``seg_infer`` run per
batch, ``segmentation3d/seg_infer.py:main()`` ≈L1-40): keeps one process
alive with the model loaded and every inference program compiled, and
serves segmentation requests over a newline-delimited-JSON socket protocol
(see ``core/serve.py``). Engine options mirror ``seg_infer`` and are fixed
at server start so requests never recompile:

    seg_serve -m <model_dir> --socket /run/seg.sock [engine options]
    seg_serve -m <model_dir> --port 7332 [--host 0.0.0.0] [engine options]

    echo '{"input": "/data/case.nii.gz", "output_dir": "/out"}' | nc -U /run/seg.sock
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from segmentation3d_tpu.core.seg_infer import segmentation, DISABLE
from segmentation3d_tpu.core.serve import SegmentationServer, serve_forever


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="3D segmentation serving daemon (warm sessions)")
    parser.add_argument("-m", "--model", required=True, action="append",
                        help="model directory; repeat for an ensemble "
                             "(probability averaging, like seg_infer)")
    parser.add_argument("--socket", default=None, metavar="PATH",
                        help="listen on this Unix-domain socket")
    parser.add_argument("--port", type=int, default=None,
                        help="listen on this TCP port instead of --socket")
    parser.add_argument("--host", default="127.0.0.1",
                        help="TCP bind address (with --port)")
    parser.add_argument("--warmup", default=None, metavar="IMAGE",
                        help="segment this representative image into a temp "
                             "dir before accepting requests, so the first "
                             "real request pays no compilation")
    parser.add_argument("-n", "--seg_name", default="seg.mha",
                        help="default output segmentation file name "
                             "(overridable per request)")
    # engine options — same surface as seg_infer, fixed for the server's life
    parser.add_argument("--partition_type", default=DISABLE,
                        choices=["DISABLE", "SIZE", "NUM", "SLAB"])
    parser.add_argument("--partition_size", type=int, nargs=3, default=None,
                        metavar=("X", "Y", "Z"))
    parser.add_argument("--partition_stride", type=int, nargs=3, default=None,
                        metavar=("X", "Y", "Z"))
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--blend", default="gaussian",
                        choices=["gaussian", "constant"])
    parser.add_argument("--post", default=None,
                        choices=[None, "largest_cc", "remove_small_cc"])
    parser.add_argument("--post_threshold", type=int, default=64)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument("--int8", action="store_true",
                        help="int8 quantized forward (implies --bf16)")
    parser.add_argument("--act_clip", type=float, default=8.0)
    parser.add_argument("--int8_calib", default=None, metavar="IMAGE[,IMG2..]")
    parser.add_argument("--num_devices", type=int, default=1)
    parser.add_argument("--spatial_shard", action="store_true")
    parser.add_argument("--checkpoint", default=None, metavar="WHICH",
                        help="'latest' (default), 'best', or an epoch number")
    parser.add_argument("--tta", default=None, metavar="AXES")
    parser.add_argument("--fine_model", default=None,
                        help="serve the coarse-to-fine pipeline: -m is the "
                             "coarse model, this is the fine model directory")
    parser.add_argument("--roi_margin", type=float, default=16.0)
    parser.add_argument("--idle_timeout", type=float, default=30.0,
                        help="drop a connection that sends no complete "
                             "request within this many seconds (a wedged "
                             "client must not block the serial queue)")
    parser.add_argument("--max_request_bytes", type=int, default=1 << 20,
                        help="reject request lines longer than this")
    args = parser.parse_args(argv)

    if (args.socket is None) == (args.port is None):
        parser.error("exactly one of --socket / --port is required")

    dtype = jnp.bfloat16 if (args.bf16 or args.int8) else jnp.float32
    quant = "int8" if args.int8 else None
    calib = args.int8_calib.split(",") if args.int8_calib else None

    from segmentation3d_tpu.cli.seg_infer import post_processing_from_args
    post = post_processing_from_args(args)

    if args.fine_model:
        if args.checkpoint:
            parser.error("--checkpoint is ambiguous with --fine_model; use "
                         "--coarse_checkpoint / --fine_checkpoint (seg_infer "
                         "flags) via a direct seg_infer run, or serve with "
                         "the default latest checkpoints")
        if len(args.model) > 1:
            parser.error("coarse ensembles (-m repeated) are not supported "
                         "with --fine_model")
        if args.spatial_shard:
            parser.error("--spatial_shard applies to SLAB partitioning, not "
                         "the coarse-to-fine pipeline")
        from segmentation3d_tpu.core.coarse_to_fine import (
            segmentation_coarse_to_fine)

        def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
                   prepared=None):
            return segmentation_coarse_to_fine(
                input_path=input_path, coarse_model_dir=args.model[0],
                fine_model_dir=args.fine_model, output_dir=output_dir,
                seg_name=seg_name,
                partition_size=args.partition_size or (96, 96, 96),
                partition_stride=args.partition_stride,
                batch_size=args.batch_size, margin_mm=args.roi_margin,
                dtype=dtype, save_image=save_image, save_prob=save_prob,
                post_processing=post, blend=args.blend,
                num_devices=args.num_devices, quant=quant,
                act_clip=args.act_clip, calib_image=calib, tta=args.tta,
                prepared=prepared)
    else:
        def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
                   prepared=None):
            return segmentation(
                input_path=input_path,
                model_dir=args.model[0] if len(args.model) == 1
                else args.model,
                output_dir=output_dir, seg_name=seg_name,
                save_image=save_image, save_prob=save_prob,
                partition_type=args.partition_type,
                partition_size=args.partition_size,
                partition_stride=args.partition_stride,
                batch_size=args.batch_size, blend=args.blend,
                post_processing=post, dtype=dtype,
                num_devices=args.num_devices,
                spatial_shard=args.spatial_shard, quant=quant,
                act_clip=args.act_clip, calib_image=calib, tta=args.tta,
                checkpoint=args.checkpoint, prepared=prepared)

    if args.warmup:
        import tempfile
        import time
        t0 = time.time()
        with tempfile.TemporaryDirectory() as tmp:
            run_fn(args.warmup, tmp, args.seg_name, False, False)
        print(f"seg_serve: warmup done in {time.time() - t0:.1f} s")

    # prep stage: start the next queued request's case discovery + two-stage
    # read-ahead (decode + stored-dtype H2D) while the current request's
    # device compute runs — a burst then costs ~max(host, device) per
    # request instead of their sum (round-5; core/serve.py exec model)
    from segmentation3d_tpu.core.seg_infer import prepare_cases

    def prep_fn(req):
        return prepare_cases(str(req["input"]))

    server = SegmentationServer(run_fn, ",".join(args.model),
                                seg_name=args.seg_name)
    serve_forever(server, socket_path=args.socket,
                  host=args.host, port=args.port,
                  idle_timeout=args.idle_timeout,
                  max_request_bytes=args.max_request_bytes,
                  prep_fn=prep_fn)


if __name__ == "__main__":
    main()
