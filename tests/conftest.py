"""Test harness configuration.

Tests run on CPU with 8 virtual devices by default (the standard JAX trick
for exercising multi-chip pjit/sharding paths without a pod — SURVEY.md §4).
Set ``SEG3D_TEST_TPU=1`` to run the suite on the real TPU instead.
"""
import os

if os.environ.get("SEG3D_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
