"""Probe: int8 MXU throughput vs bf16 on the slab window-conv shapes.

TPU v5e rates int8 matmul at ~2x bf16 peak (394 vs 197 TOPS). If XLA lowers
int8 `conv_general_dilated` (preferred_element_type=int32) onto the int8 MXU
path, the headline's conv bucket (~400 ms/volume, BASELINE.md round-3 floor
table) could shrink enough to justify building a quantized inference mode.
This measures the isolated ceiling BEFORE any quantization work.

Method: chain the op (output feeds the next input) so XLA can neither CSE
identical calls nor dead-code/slice them away, and read PER-OP device times
from a `jax.profiler.trace` (the established attribution recipe — wall time
would fold in the int8 path's requantize passes and the relay dispatch).
"""
import argparse
import glob
import gzip
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np

INNER = 8


def op_times_ms(trace_dir):
    """Sum device durations per HLO op name from the newest trace."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    raw = json.loads(gzip.decompress(open(paths[-1], "rb").read()))
    out = {}
    for ev in raw.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        out[name] = out.get(name, 0.0) + ev["dur"] / 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/int8_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    dn = ("NDHWC", "DHWIO", "NDHWC")
    zy_same = ((1, 1), (1, 1), (0, 0))
    rng = np.random.default_rng(0)

    # the dominant packed-domain mid-conv shape: full-res decoder level,
    # P*C = 128 lanes, 64x512 slab planes, 128 columns (W=512, P=4)
    xs, ws = (1, 64, 512, 128, 128), (3, 3, 1, 128, 128)

    xb = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=ws) * 0.029, jnp.bfloat16)  # var-preserving
    xi = jnp.asarray(rng.integers(-127, 128, size=xs), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, size=ws), jnp.int8)

    @jax.jit
    def chain_bf16(x, w):
        for _ in range(INNER):
            x = lax.conv_general_dilated(x, w, (1, 1, 1), zy_same,
                                         dimension_numbers=dn)
        return x

    @jax.jit
    def chain_int8(x, w):
        for _ in range(INNER):
            y = lax.conv_general_dilated(x, w, (1, 1, 1), zy_same,
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            # requantize: arithmetic-mean shift keeps values in int8 range;
            # shows up as its own fusion in the trace (excluded from conv ms)
            x = jnp.clip(y >> 11, -127, 127).astype(jnp.int8)
        return x

    # pure-MXU reference: big square matmul chain, bf16 vs int8
    A = 4096
    mb = jnp.asarray(rng.normal(size=(A, A)) / np.sqrt(A), jnp.bfloat16)
    mi = jnp.asarray(rng.integers(-127, 128, size=(A, A)), jnp.int8)

    @jax.jit
    def mm_bf16(z, w):
        for _ in range(INNER):
            z = z @ w
        return z

    @jax.jit
    def mm_int8(z, w):
        for _ in range(INNER):
            y = lax.dot_general(z, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            z = jnp.clip(y >> 12, -127, 127).astype(jnp.int8)
        return z

    def run(fn, *a):
        y = fn(*a)
        _ = float(jnp.asarray(y, jnp.float32).ravel()[0])

    for f, a in ((chain_bf16, (xb, wb)), (chain_int8, (xi, wi)),
                 (mm_bf16, (mb, mb)), (mm_int8, (mi, mi))):
        run(f, *a)  # compile + warm
    with jax.profiler.trace(args.trace_dir):
        run(chain_bf16, xb, wb)
        run(chain_int8, xi, wi)
        run(mm_bf16, mb, mb)
        run(mm_int8, mi, mi)
    time.sleep(2)

    times = op_times_ms(args.trace_dir)
    conv_flop = 2.0 * np.prod(xs[:4]) * ws[-1] * (np.prod(ws[:3]) * ws[3]) * INNER
    mm_flop = 2.0 * A ** 3 * INNER
    rows = sorted(times.items(), key=lambda kv: -kv[1])[:30]
    print("top ops:")
    for name, ms in rows:
        print(f"  {ms:9.2f} ms  {name}")
    conv = {k: v for k, v in times.items() if k.startswith(("convolution", "conv"))}
    dots = {k: v for k, v in times.items() if "dot" in k or k.startswith("custom")}
    print("\nconv ops:", {k: round(v, 2) for k, v in conv.items()})
    print("dot ops:", {k: round(v, 2) for k, v in dots.items()})
    print(f"\nconv dense FLOP per chain: {conv_flop/1e12:.3f} T;"
          f" mm per chain: {mm_flop/1e12:.3f} T")


if __name__ == "__main__":
    main()
