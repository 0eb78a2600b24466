"""Multi-host (multi-process) scaffolding.

The reference is strictly single-process/single-GPU; this is NEW scope (BASELINE.md
2-host target). The flow is the standard JAX multi-controller recipe:

  1. every host calls `initialize()` (jax.distributed.initialize) — on TPU pods the
     coordinator/process count are auto-detected from the environment; elsewhere pass
     them explicitly (or via TPU_SPLAT_COORDINATOR / TPU_SPLAT_NUM_PROCESSES /
     TPU_SPLAT_PROCESS_ID);
  2. `global_mesh(data=...)` builds the ("data", "gauss") mesh over jax.devices()
     (which, after initialize, spans every host); collectives over "gauss" ride
     ICI/DCN as laid out by the device order;
  3. each host feeds only its OWN shard of the camera batch
     (`local_batch_slice(batch)`), and assembles global device arrays with
     `jax.make_array_from_process_local_data`.

Verified by tools/dryrun_multihost.py: two CPU processes, a 2x2 global mesh, one
batched train step with cross-process collectives (gloo).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..utils.log import get_logger

log = get_logger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent, no-op single-process)."""
    coordinator_address = coordinator_address or os.environ.get("TPU_SPLAT_COORDINATOR")
    if num_processes is None and os.environ.get("TPU_SPLAT_NUM_PROCESSES"):
        num_processes = int(os.environ["TPU_SPLAT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TPU_SPLAT_PROCESS_ID"):
        process_id = int(os.environ["TPU_SPLAT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU pods auto-detect from the metadata server; single host is a no-op
        try:
            jax.distributed.initialize()
        except Exception as e:  # pragma: no cover - single-process fallback
            log.debug("jax.distributed.initialize skipped: %s", e)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(data: int = 1):
    """("data", "gauss") mesh over ALL processes' devices."""
    from .mesh import make_mesh

    return make_mesh(jax.devices(), data=data)


def local_batch_slice(batch: int) -> slice:
    """The slice of the global camera batch this host must feed."""
    n = jax.process_count()
    if batch % n:
        raise ValueError(f"global batch {batch} not divisible by {n} processes")
    b = batch // n
    i = jax.process_index()
    return slice(i * b, (i + 1) * b)


def make_global_array(mesh, spec, local_np: np.ndarray):
    """Assemble a global sharded array from this host's local shard of data."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_np
    )
