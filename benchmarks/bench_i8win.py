"""A/B: XLA 3-conv int8 narrow-halo window conv vs the Pallas in-kernel-halo
kernel (`ops/pallas_i8win.py`) on the 512^3 headline's real site geometries.

Method: K-iteration fori_loop chain (int8 out feeds int8 in) inside ONE jit,
timed by wall clock after a warmup with a forced readback — the per-dispatch
relay overhead (~25-70 ms) amortizes over K, and chaining defeats XLA's
dead-code slicing (CLAUDE.md timing rules).

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_i8win.py
"""
import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.ops.packed_conv import window_kernels_np
from segmentation3d_tpu.ops.quant import (window_conv_packed_i8,
                                          quantize_weight_np)
from segmentation3d_tpu.ops.pallas_i8win import (window_conv_i8_pallas,
                                                 mid9_np, halo9_np,
                                                 halo9_full_np)

# (name, D, H, cols, P, cin) — the REAL packed 512^3 slab res-conv sites
# with cin == cout (from models/packed_vnet.py's registrations: encoder res
# blocks at pick_p packing, decoder res blocks at the skip's packing ->
# 256-lane tensors). The site's conv count in the net is in the name.
SITES = [
    ("dn32 x2  [128l]", 32, 256, 64, 4, 32),
    ("dn64 x3  [128l]", 16, 128, 64, 2, 64),
    ("up128 x3 [256l]", 16, 128, 64, 2, 128),
    ("up64 x2  [256l]", 32, 256, 64, 4, 64),
    ("up32 x1  [256l]", 64, 512, 64, 8, 32),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ht", type=int, default=None)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    s_a = 8.0 / 127.0
    inv_sa = 127.0 / 8.0

    for name, D, H, cols, P, cin in SITES:
        pc = P * cin
        w = rng.normal(0, 0.3, (3, 3, 3, cin, cin)).astype(np.float32)
        wq, ws = quantize_weight_np(w)
        mid, wl, wr = window_kernels_np(wq.astype(np.float32), P)
        mid_i, wl_i, wr_i = (jnp.asarray(m.astype(np.int8))
                             for m in (mid, wl, wr))
        w9 = jnp.asarray(mid9_np(np.asarray(mid, np.int8)))
        halos = {
            "slice": (jnp.asarray(halo9_np(np.asarray(wl, np.int8))),
                      jnp.asarray(halo9_np(np.asarray(wr, np.int8)))),
            "full": (jnp.asarray(halo9_full_np(np.asarray(wl, np.int8),
                                               P, "left")),
                     jnp.asarray(halo9_full_np(np.asarray(wr, np.int8),
                                               P, "right"))),
        }
        scale = jnp.asarray(np.tile(ws * s_a, P).astype(np.float32))
        bias = jnp.asarray(rng.normal(0, 0.5, pc).astype(np.float32))
        x = jnp.asarray(rng.integers(-127, 128, (1, D, H, cols, pc)
                                     ).astype(np.int8))

        @jax.jit
        def xla_chain(x):
            def body(_, v):
                acc = window_conv_packed_i8(v, mid_i, wl_i, wr_i, P=P, cin=cin)
                y = acc.astype(jnp.float32) * scale.reshape(1, 1, 1, 1, -1) \
                    + bias.reshape(1, 1, 1, 1, -1)
                y = jnp.maximum(y, 0.0)
                return jnp.clip(jnp.round(y * inv_sa), -127, 127
                                ).astype(jnp.int8)
            return jax.lax.fori_loop(0, args.iters, body, x)

        def pallas_chain_for(wl9, wr9):
            @jax.jit
            def pallas_chain(x):
                def body(_, v):
                    return window_conv_i8_pallas(
                        v, w9, wl9, wr9, scale, bias, P=P, cin=cin, cout=cin,
                        act="relu", inv_sa=inv_sa, out_int8=True, ht=args.ht)
                return jax.lax.fori_loop(0, args.iters, body, x)
            return pallas_chain

        runs = [("xla", xla_chain)] + [
            (f"pl/{m}", pallas_chain_for(*halos[m])) for m in halos]
        vox = D * H * cols * P
        for label, fn in runs:
            try:
                out = fn(x)
                float(out[0, 0, 0, 0, 0])  # forced readback
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    out = fn(x)
                    float(out[0, 0, 0, 0, 0])
                    ts.append((time.perf_counter() - t0) / args.iters)
                ms = min(ts) * 1e3
                tops = 2 * 27 * vox * cin * cin / (ms / 1e3) / 1e12
                print(f"{name:16s} {label:9s} {ms:7.3f} ms/conv "
                      f"({tops:6.1f} TOPS dense)", flush=True)
            except Exception as e:
                print(f"{name:16s} {label:9s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        # parity spot check on device (first conv only)
        a = window_conv_packed_i8(x, mid_i, wl_i, wr_i, P=P, cin=cin)
        ya = jnp.clip(jnp.round((a.astype(jnp.float32)
                                 * scale.reshape(1, 1, 1, 1, -1)
                                 + bias.reshape(1, 1, 1, 1, -1)
                                 ).clip(0.0) * inv_sa), -127, 127
                      ).astype(jnp.int8)
        for m, (wl9, wr9) in halos.items():
            try:
                yb = window_conv_i8_pallas(x, w9, wl9, wr9, scale, bias, P=P,
                                           cin=cin, cout=cin, act="relu",
                                           inv_sa=inv_sa, ht=args.ht)
                diff = np.abs(np.asarray(ya, np.int32)
                              - np.asarray(yb, np.int32))
                print(f"{name:16s} parity/{m}: maxdiff {diff.max()} "
                      f"agree {(diff == 0).mean():.6f}", flush=True)
            except Exception as e:
                print(f"{name:16s} parity/{m} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
