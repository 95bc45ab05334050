"""Per-site conv microbenchmark: direct XLA vs channel-packed vs window-GEMM.

Times each stride-1 3x3x3 conv shape that appears in the V-Net forward on
the 512^3 slab planes (and optionally 96^3 train crops), for the three
pure-XLA lowerings in :mod:`segmentation3d_tpu.ops.packed_conv`. Used to
pick the per-site routing defaults in ``models/fused_vnet.py``.

Usage (TPU):
    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_convs.py
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

# (name, [B,D,H,W], cin, cout) — the V-Net stride-1 3^3 conv sites on a
# 64x512x512 slab (decoder at full/half/quarter res mirrors the encoder)
SLAB_SITES = [
    ("stem 1->16 @64x512^2", (1, 64, 512, 512), 1, 16),
    ("res16 16->16 @64x512^2", (1, 64, 512, 512), 16, 16),
    ("res32 32->32 @32x256^2", (1, 32, 256, 256), 32, 32),
    ("up32res 32->32 @64x512^2", (1, 64, 512, 512), 32, 32),
    ("res64 64->64 @16x128^2", (1, 16, 128, 128), 64, 64),
    ("up64res 64->64 @32x256^2", (1, 32, 256, 256), 64, 64),
    ("head 32->2 @64x512^2", (1, 64, 512, 512), 32, 2),
]
CROP_SITES = [
    ("stem 1->16 @96^3 b8", (8, 96, 96, 96), 1, 16),
    ("res16 16->16 @96^3 b8", (8, 96, 96, 96), 16, 16),
    ("up32res 32->32 @96^3 b8", (8, 96, 96, 96), 32, 32),
    ("head 32->2 @96^3 b8", (8, 96, 96, 96), 32, 2),
]


def make_looped(fn, K):
    """Amortize the ~25-70 ms axon relay dispatch overhead: run ``fn`` K
    times inside ONE jit, chaining each input on the previous output so XLA
    cannot hoist or CSE the conv out of the scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped(x, w, b):
        def body(carry, _):
            out = fn(x + carry, w, b)
            return (out.reshape(-1)[0] * 1e-30).astype(x.dtype), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)
        return carry

    return looped


def time_fn(fn, *args, reps=3, K=8):
    looped = make_looped(fn, K)
    np.asarray(looped(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(looped(*args))  # scalar readback forces completion
        times.append(time.perf_counter() - t0)
    return min(times) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", default="slab", choices=["slab", "crop", "all"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segmentation3d_tpu.ops import packed_conv as pk

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    sites = {"slab": SLAB_SITES, "crop": CROP_SITES,
             "all": SLAB_SITES + CROP_SITES}[args.sites]

    def direct(x, w, b):
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (out + b.reshape(1, 1, 1, 1, -1)).astype(x.dtype)

    direct = jax.jit(direct)
    packed = jax.jit(lambda x, w, b: pk.packed_conv3d(x, w, b, out_dtype=x.dtype))
    window = jax.jit(lambda x, w, b: pk.window_conv3d(x, w, b, out_dtype=x.dtype))

    results = []
    for name, shape, cin, cout in sites:
        x = jnp.asarray(rng.normal(size=shape + (cin,)), np.float32).astype(dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, np.float32)
        b = jnp.zeros((cout,), np.float32)
        useful_tf = 2 * 27 * cin * cout * np.prod(shape) / 1e12
        row = {"site": name, "useful_TF": round(useful_tf, 4)}
        for label, fn in [("direct", direct), ("packed", packed),
                          ("window", window)]:
            try:
                dt = time_fn(fn, x, w, b, reps=args.reps)
                row[label + "_ms"] = round(dt * 1e3, 2)
                row[label + "_TFs"] = round(useful_tf / dt, 1)
            except Exception as e:  # noqa: BLE001 — report per-variant failure
                row[label + "_ms"] = f"ERR {type(e).__name__}"
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
