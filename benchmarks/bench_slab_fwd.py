"""Single-slab fused-forward timing across conv-routing variants.

Times ONE fused V-Net forward on a [1, slab, 512, 512, 1] plane stack for
several backend routings — much faster to compile than the full sliding
window program, for iterating on the slab headline's conv mix.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_slab_fwd.py
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
    ap.add_argument("--slab", type=int, default=64)
    ap.add_argument("--xy", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="packed,win_all,win_res,win_3216")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.models.fused_vnet import build_fused_forward

    dtype = jnp.bfloat16
    net = SegmentationNet(in_channels=1, out_channels=2, dtype=dtype)
    x0 = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(1, args.slab, args.xy, args.xy, 1)),
        np.float32).astype(dtype))

    W = frozenset({"stem", "res", "head"})
    NOP = dict(pallas_sites=frozenset())
    VARIANTS = {
        "packed_pallashead": dict(window_sites=frozenset()),
        "packed": dict(window_sites=frozenset(), **NOP),
        "win_all_pallashead": dict(window_sites=W),
        "win_all": dict(window_sites=W, **NOP),
        "win_res": dict(window_sites=frozenset({"res"}), **NOP),
        "win_3216": dict(window_sites=W, window_couts=(32, 16), **NOP),
        "win_32": dict(window_sites=W, window_couts=(32,), **NOP),
        "win_all_deconv": dict(window_sites=W, use_deconv2x=True, **NOP),
    }
    from segmentation3d_tpu.models.packed_vnet import build_packed_forward
    for name in args.variants.split(","):
        try:
            if name == "packed_domain":
                afn, fv = build_packed_forward(net, variables, dtype=dtype)
            else:
                afn, fv = build_fused_forward(net, variables, dtype=dtype,
                                              **VARIANTS[name])
            fn = jax.jit(afn)
            fv = jax.device_put(fv)
            out = fn(fv, x)
            np.asarray(out[0, 0, 0, 0])
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = fn(fv, x)
                np.asarray(out[0, 0, 0, 0])
                times.append(time.perf_counter() - t0)
            print(json.dumps({"variant": name,
                              "ms": round(min(times) * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001 — report per-variant failure
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(json.dumps({"variant": name, "error": msg}), flush=True)


if __name__ == "__main__":
    main()
