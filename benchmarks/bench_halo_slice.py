"""Probe: do the int8 window-conv HALO convs speed up if their lane-slice
inputs are materialized contiguously instead of fused into the conv?

The 512^3 int8 headline profile (BASELINE.md round-3) shows the two narrow
halo convs running at ~11.7 TOPS — the conv reads a strided rank-6 s8 lane
slice (``xp[..., (P-1)*cin:]`` of a [.., P*cin] tensor), which breaks the
(32,128) int8 tiling. Hypothesis: an explicit contiguous copy of the slice
(1/P of the tensor, ~0.05 ms at HBM speed) lets the conv run at proper int8
throughput, net saving most of the ~100 ms/volume halo bucket.

Method (established recipe): chain the op so XLA cannot CSE it away, force a
readback, read PER-OP device times from a ``jax.profiler.trace``. Variant B
inserts ``lax.optimization_barrier`` between slice and conv.

MEASURED (TPU v5e, round 3) — **counter-result, do not re-try**:

- site 16 (encoder 16ch, P=8, [1,64,512,64,128]): fused 1.72 vs contig 1.88
  ms/iter — NO WIN; the whole window conv incl. requant is 1.7 ms here.
- site 32 (32ch at P=4, [1,64,512,128,128]): mid_only 3.98, fused 28.0,
  contig 33.7 ms/iter — contig LOSES again. The isolated chain's 24 ms
  "halo overhead" is NOT what the real forward pays (BASELINE.md attributes
  ~95-110 ms/volume of halo machinery across ALL sites): in the real
  program the s32 pad+adds fuse into the conv's dequant+bias+act+requant
  epilogue, while this probe's bare `>>`-requant chain materializes the
  s32 add passes. Lesson: micro-chains over-count epilogue traffic; trust
  the in-program trace (bench.py --profile).
- site 32p8 (the REAL dominant site: 32ch at the level chain's P=8,
  [1,64,512,64,256] — where the in-program trace measured the halo convs
  at 11.7 TOPS): mid_only 6.73, fused 17.17, contig 20.05, blockdiag
  (both halos as ONE conv on a contiguous 2*cin-lane input with the column
  shifts baked in) 20.06 ms/iter. EVERY reformulation loses; the fused
  strided-slice 3-conv decomposition is the floor at the real geometry too.
"""
import argparse
import glob
import gzip
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np

INNER = 8


def op_times_ms(trace_dir):
    """Per-HLO-op DEVICE durations (trace_top.py's filtering: device pids
    only, step-marker tracks excluded)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    raw = json.loads(gzip.decompress(open(paths[-1], "rb").read()))
    events = raw.get("traceEvents", [])
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, n in procs.items()
                   if "TPU" in n or "/device" in n.lower()}
    out = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid")
        if device_pids and pid not in device_pids:
            continue
        if "step" in threads.get((pid, ev.get("tid")), "").lower():
            continue
        name = ev.get("name", "")
        out[name] = out.get(name, 0.0) + ev["dur"] / 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/halo_trace")
    ap.add_argument("--site", default="16", choices=["16", "32", "32p8"],
                    help="full-res 16ch (P=8), 32ch at P=4, or the real "
                         "dominant 32ch-at-P=8 site")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.site == "16":
        cin = cout = 16
        P = 8
        xs = (1, 64, 512, 64, P * cin)    # full-res slab, packed (encoder 16ch)
    elif args.site == "32":
        cin = cout = 32
        P = 4
        xs = (1, 64, 512, 128, P * cin)
    else:  # "32p8": the REAL dominant site — the level chain keeps P0=8,
        # so the full-res 32ch convs run at P=8 (256 lanes, cols=64);
        # this is where the trace measured the halo convs at 11.7 TOPS
        cin = cout = 32
        P = 8
        xs = (1, 64, 512, 64, P * cin)

    dn = ("NDHWC", "DHWIO", "NDHWC")
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(-127, 128, size=xs), jnp.int8)
    mid = jnp.asarray(rng.integers(-16, 17, size=(3, 3, 1, P * cin, P * cout)),
                      jnp.int8)
    wl = jnp.asarray(rng.integers(-16, 17, size=(3, 3, 1, cin, cout)), jnp.int8)
    wr = jnp.asarray(rng.integers(-16, 17, size=(3, 3, 1, cin, cout)), jnp.int8)

    def conv_i8(x, w, padding):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), padding, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    # block-diag combined kernel: both halos as ONE conv on a 2*cin-lane
    # contiguous input (the x column shifts are baked into the input build)
    wlr = np.zeros((3, 3, 1, 2 * cin, 2 * cout), np.int8)
    wlr[:, :, :, :cin, :cout] = np.asarray(wl)
    wlr[:, :, :, cin:, cout:] = np.asarray(wr)
    wlr = jnp.asarray(wlr)

    def window_i8(x, mode):
        zy_same = ((1, 1), (1, 1), (0, 0))
        out = conv_i8(x, mid, zy_same)
        pad4 = ((0, 0),) * 4
        if mode == "blockdiag":
            # U[.., q, 0:cin] = x[.., q-1, (P-1)cin:], U[.., q, cin:] =
            # x[.., q+1, :cin]  (zero at the edges)
            xl = jnp.pad(x[:, :, :, :-1, (P - 1) * cin:],
                         pad4[:3] + ((1, 0), (0, 0)))
            xr = jnp.pad(x[:, :, :, 1:, :cin], pad4[:3] + ((0, 1), (0, 0)))
            u = lax.optimization_barrier(jnp.concatenate([xl, xr], axis=-1))
            lr = conv_i8(u, wlr, zy_same)
            out = out + jnp.pad(lr[..., :cout], pad4 + ((0, (P - 1) * cout),))
            out = out + jnp.pad(lr[..., cout:], pad4 + (((P - 1) * cout, 0),))
        elif mode != "mid_only":
            xl = x[..., (P - 1) * cin:]
            xr = x[..., :cin]
            if mode == "contig_slice":
                xl, xr = lax.optimization_barrier((xl, xr))
            lc = conv_i8(xl, wl, ((1, 1), (1, 1), (1, -1)))
            rc = conv_i8(xr, wr, ((1, 1), (1, 1), (-1, 1)))
            out = out + jnp.pad(lc, pad4 + ((0, (P - 1) * cout),))
            out = out + jnp.pad(rc, pad4 + (((P - 1) * cout, 0),))
        return jnp.clip(out >> 9, -127, 127).astype(jnp.int8)

    def make_chain(mode):
        @jax.jit
        def chain(x):
            for _ in range(INNER):
                x = window_i8(x, mode)
            return x
        return chain

    results = {}
    for name in ("mid_only", "fused_slice", "contig_slice", "blockdiag"):
        fn = make_chain(name)
        fn(xi).block_until_ready()           # compile
        td = os.path.join(args.trace_dir, name)
        with jax.profiler.trace(td):
            out = fn(xi)
            _ = int(np.asarray(out[0, 0, 0, 0, 0]))  # force readback
        ops = {k: v for k, v in op_times_ms(td).items()
               if not k.startswith(("jit_", "Steal", "Infeed"))}
        total = sum(ops.values())
        results[name] = total
        print(f"{name}: device total {total/INNER:.3f} ms/iter")
        for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:12]:
            print(f"    {v/INNER:8.3f} ms  {k}")

    m, a, b, c = (results[k] for k in
                  ("mid_only", "fused_slice", "contig_slice", "blockdiag"))
    print(f"VERDICT: mid_only {m/INNER:.3f}, fused {a/INNER:.3f}, "
          f"contig {b/INNER:.3f}, blockdiag {c/INNER:.3f} ms/iter; halo "
          f"overhead {(a-m)/INNER:.3f} / {(b-m)/INNER:.3f} / {(c-m)/INNER:.3f}")


if __name__ == "__main__":
    main()
