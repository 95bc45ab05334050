"""Test harness configuration.

Tests run on CPU with 8 virtual devices by default (the standard JAX trick
for exercising multi-chip pjit/sharding paths without a pod — SURVEY.md §4).
Set ``SEG3D_TEST_TPU=1`` to run the suite on the real TPU instead.
"""
import os

if os.environ.get("SEG3D_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override a pre-set axon/tpu platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # a sitecustomize may have imported+configured jax already (axon PJRT
    # boot); the env vars above are then too late — override at config level.
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # backend already initialized; XLA_FLAGS path applies instead

# Persistent compilation cache: V-Net graphs recompile identically across test
# runs; caching them cuts suite time dramatically on the single host core.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
