"""Multi-host (DCN) initialization — the additive layer beyond single-host
SPMD (SURVEY.md P2: the reference has no distributed backend at all; here
multi-host is one call on top of the same mesh code).

On a TPU pod slice, call :func:`initialize` once per host before building
meshes; ``jax.devices()`` then spans all hosts and the existing
``parallel.make_mesh`` / pjit code scales across DCN unchanged. On cloud
TPUs the coordinator/process env comes from the runtime, so no arguments
are usually needed.
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
