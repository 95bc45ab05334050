"""Multi-host (DCN) coordination — the additive layer beyond single-host
SPMD (SURVEY.md P2: the reference has no distributed backend at all — its
only parallelism is single-process ``nn.DataParallel``; here multi-host is
one call on top of the same mesh code).

On a TPU pod slice, call :func:`initialize` once per host before building
meshes; ``jax.devices()`` then spans all hosts and the existing
``parallel.make_mesh`` / pjit code scales across DCN unchanged (XLA
partitions collectives over ICI within a slice and DCN across slices). On
cloud TPUs the coordinator/process env comes from the runtime, so no
arguments are usually needed.

The train loop uses :func:`is_primary` to keep exactly one process writing
checkpoints/logs, and :func:`barrier` to keep non-primary processes from
racing past a save point. All helpers degrade to no-ops in a
single-process environment, so the same code path serves 1 host and N.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Initialize jax.distributed (no-op when already initialized or
    single-process). Returns the global device count."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment
    return jax.device_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def barrier(name: str = "barrier", timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used around checkpoint saves so non-primary hosts don't start the next
    epoch's file I/O (e.g. resume-readers) before the primary finished
    writing.

    This is a HOST barrier through the coordination service, NOT a device
    collective (``sync_global_devices``): a psum-based barrier is an
    independent device program, so a host that runs ahead of the async
    device stream can launch it while older steps are still in flight —
    processes then initialize their collective cliques in different orders
    and deadlock (measured on a 2-process CPU/gloo cluster: rank 0 stuck
    creating the step-4 clique while rank 1 creates the barrier clique).
    ``name`` must be unique per synchronization point (the train loop uses
    ``chk_<epoch>``)."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)  # fallback: device barrier


def broadcast_from_primary(tree):
    """Value of ``tree`` on process 0, on every process (identity when
    single-process). Keeps host-side decisions (e.g. a sampled case order)
    consistent across hosts."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
