"""Multi-host coordination layer (parallel/distributed.py).

The suite runs single-process, so these tests check (a) the graceful
single-process degradation of every helper, and (b) a REAL
``jax.distributed.initialize`` handshake in a subprocess (1-process
cluster with an explicit local coordinator) followed by a mesh psum —
the actual code path a pod-slice host runs.
"""
import os
import socket
import subprocess
import sys

import jax

from segmentation3d_tpu.parallel.distributed import (
    initialize, is_primary, barrier, broadcast_from_primary)


def test_single_process_degradation():
    n = initialize()  # no coordinator env: swallowed, returns device count
    assert n == jax.device_count()
    assert is_primary()
    barrier("t")  # no-op
    tree = {"a": 1, "b": [2, 3]}
    assert broadcast_from_primary(tree) == tree


def test_real_initialize_subprocess():
    """One-process 'cluster' with an explicit coordinator: the real
    jax.distributed handshake + a sharded psum over the mesh."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax
import jax.numpy as jnp
from segmentation3d_tpu.parallel.distributed import (
    initialize, is_primary, barrier, broadcast_from_primary)
from segmentation3d_tpu.parallel import make_mesh, shard_batch

n = initialize(coordinator_address="127.0.0.1:{port}",
               num_processes=1, process_id=0)
assert jax.process_count() == 1 and is_primary()
assert n >= 1
barrier("after-init")
assert broadcast_from_primary((1, 2)) == (1, 2)
mesh = make_mesh(-1)
nd = mesh.devices.size
x = shard_batch(jnp.ones((nd, 2)), mesh)
total = float(jax.jit(lambda v: v.sum())(x))
assert total == 2.0 * nd, total
print("DIST-OK")
"""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTEST_CURRENT_TEST")}
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, env=env)
    assert "DIST-OK" in out.stdout, out.stdout + out.stderr
