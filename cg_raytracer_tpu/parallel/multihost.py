"""Multi-host launch support.

Reference capability: none (single process; SURVEY §2 parallelism table).  This is
the framework's DCN layer: ``jax.distributed.initialize`` turns the same
``Mesh``-based code from parallel/sharding.py into a multi-host pod-slice program —
XLA routes collectives over ICI within a slice and DCN across hosts.  Renders are
re-runnable at pixel-tile granularity, so failure recovery = re-run the failed
host's tiles (SURVEY §5 failure-detection row).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (no-op when single-process).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args
    are omitted, mirroring the standard pod-slice launch contract.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process run
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "rays"):
    """1-D mesh over every device of every host (ICI within hosts, DCN across)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_rows(height: int) -> slice:
    """The image-row slice this host owns under row sharding — for assembling
    outputs without an all-gather (each host writes its own tile to disk)."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-height // n)
    return slice(i * per, min((i + 1) * per, height))
