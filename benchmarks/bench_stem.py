"""A/B: the quantized forward's STEM cluster — XLA packed window conv
(bf16, P=8) + fused requant vs the Pallas lane-packed `thin_conv3d` with an
in-kernel requant epilogue.

Why the stem: the int8 headline trace shows ~34 ms/slab of stem machinery
(`fusion.373/374` + `clamp_convert_fusion.27`): the 1-channel input makes
the packed halo convs run on 8-lane tensors that the bf16 (2,128) tiling
pads 16x, and the requant is a full-size standalone pass. `thin_conv3d`
packs L=8 output x-positions into dense 128-lane GEMMs and now fuses the
requant in-kernel.

Chained timing: both arms carry a scalar dependency through K iterations
(the input re-add costs both arms equally and defeats DCE).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_stem.py
"""
import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.ops.packed_conv import (window_kernels_np,
                                                window_conv_packed)
from segmentation3d_tpu.ops.pallas_conv import thin_conv3d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ht", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    D, HW, cout = args.d, args.hw, args.cout
    P = 8
    inv_sa = 127.0 / 8.0
    w = rng.normal(0, 0.5, (3, 3, 3, 1, cout)).astype(np.float32)
    b = rng.normal(0, 0.2, cout).astype(np.float32)
    mid, wl, wr = window_kernels_np(w, P)
    mid_b, wl_b, wr_b = (jnp.asarray(m, jnp.bfloat16) for m in (mid, wl, wr))
    bp = jnp.asarray(np.tile(b, P), jnp.float32)
    wj = jnp.asarray(w)
    bj = jnp.asarray(b)
    x = jnp.asarray(rng.normal(0, 1, (1, D, HW, HW // P, P)
                               ).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def xla_chain(x0):
        def body(_, carry):
            v, s = carry
            a = window_conv_packed(v, mid_b, wl_b, wr_b, bp, P=P, cin=1,
                                   accum="bf16")
            a = jnp.maximum(a.astype(jnp.float32), 0.0)
            y = jnp.clip(jnp.round(a * inv_sa), -127, 127).astype(jnp.int8)
            return v + (s * 0).astype(v.dtype), s + y[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, args.iters, body,
                                 (x0, jnp.zeros((), jnp.int32)))[1]

    @jax.jit
    def pallas_chain(x0):
        def body(_, carry):
            v, s = carry
            vu = v.reshape(1, D, HW, HW, 1)  # unpacked view (free)
            y = thin_conv3d(vu, wj, bj, act="relu", quant_inv_sa=inv_sa,
                            ht=args.ht)
            return v + (s * 0).astype(v.dtype), s + y[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, args.iters, body,
                                 (x0, jnp.zeros((), jnp.int32)))[1]

    for label, fn in (("xla", xla_chain), ("pallas", pallas_chain)):
        try:
            int(fn(x))  # warm-up + readback
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                int(fn(x))
                ts.append((time.perf_counter() - t0) / args.iters)
            print(f"stem {label:7s} {min(ts) * 1e3:7.3f} ms/conv(+chain pass)",
                  flush=True)
        except Exception as e:
            print(f"stem {label:7s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # parity: int8 outputs agree to <=1 LSB
    a = window_conv_packed(x, mid_b, wl_b, wr_b, bp, P=P, cin=1, accum="bf16")
    ya = jnp.clip(jnp.round(jnp.maximum(a.astype(jnp.float32), 0.0) * inv_sa),
                  -127, 127).astype(jnp.int8)
    yb = thin_conv3d(x.reshape(1, D, HW, HW, 1), wj, bj, act="relu",
                     quant_inv_sa=inv_sa, ht=args.ht)
    ya = np.asarray(ya).reshape(1, D, HW, HW, cout).astype(np.int32)
    yb = np.asarray(yb).astype(np.int32)
    diff = np.abs(ya - yb)
    print(f"stem parity: maxdiff {diff.max()} agree {(diff == 0).mean():.6f}")


if __name__ == "__main__":
    main()
