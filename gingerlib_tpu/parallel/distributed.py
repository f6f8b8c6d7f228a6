"""Multi-host (DCN) backend: jax.distributed init + process-spanning mesh.

The reference's parallelism stops at single-node rayon (SURVEY.md §2.8/§5);
scaling past one host here is jax.distributed over DCN: every host runs the
same program, JAX stitches the per-host TPU slices into one global device
set, and the existing `shard_map` pipelines (sharded.py) run unchanged over
a process-spanning mesh — collectives ride ICI within a slice and DCN
across hosts.

Usage (one command per host):

    GINGERLIB_COORDINATOR=host0:1234 GINGERLIB_NUM_PROCESSES=2 \
    GINGERLIB_PROCESS_ID=<i> python train.py

    from gingerlib_tpu.parallel import distributed
    distributed.init_from_env()          # no-op when unset / single host
    mesh = distributed.global_mesh()     # all devices across all hosts
"""

from __future__ import annotations

import os

import numpy as np


_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the multi-host runtime (idempotent).

    Returns True if jax.distributed was initialized by this call.  With
    num_processes in (None, 0, 1) this is a no-op: single-host runs (and
    the CI virtual-device mesh) need no coordinator.
    """
    global _initialized
    if _initialized or not num_processes or num_processes <= 1:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def init_from_env() -> bool:
    """Initialize from GINGERLIB_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}."""
    num = int(os.environ.get("GINGERLIB_NUM_PROCESSES", "1"))
    if num <= 1:
        return False
    return init_distributed(
        coordinator_address=os.environ.get("GINGERLIB_COORDINATOR"),
        num_processes=num,
        process_id=int(os.environ.get("GINGERLIB_PROCESS_ID", "0")))


def global_mesh(axis: str = "data"):
    """1-D mesh over every device in the (possibly multi-host) job.

    Device order follows jax.devices(): grouped by process, so a blocked
    sharding keeps each host's shard on its own slice and the all-gather
    in sharded_msm crosses DCN exactly once per partial."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def process_info() -> tuple:
    """(process_index, process_count) — for per-host logging/sharding."""
    import jax
    return jax.process_index(), jax.process_count()
