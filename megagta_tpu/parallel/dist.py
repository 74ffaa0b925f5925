"""Multi-host initialization and cross-host sharding helpers.

The reference is single-node (SURVEY.md 2.10); scale-out across hosts uses
jax.distributed over DCN with per-host data feeding. On a single host these
helpers degrade to no-ops, so the same driver code runs everywhere.
"""

from __future__ import annotations

import os

import jax

__all__ = ["init_distributed", "global_mesh", "host_read_slice"]


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True when running multi-process."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if not coordinator or num_processes <= 1:
        return False
    pid = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=pid,
    )
    return True


def global_mesh(axis: str = "data"):
    """1-D mesh over every device of every participating host."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_read_slice(num_items: int) -> tuple[int, int]:
    """This host's contiguous slice of a length-num_items input (read
    streaming is per-host; device sharding happens after packing)."""
    n = jax.process_count()
    i = jax.process_index()
    per = (num_items + n - 1) // n
    return i * per, min((i + 1) * per, num_items)
