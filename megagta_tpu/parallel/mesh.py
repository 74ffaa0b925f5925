"""Device mesh + sharding strategies.

The reference is single-host shared-memory (SURVEY.md section 2.10); the
TPU-native scale-out axes are:
  * "reads"  (DP): read batches sharded across devices for k-mer counting
    (the CX1 lv0 bucket accounting, src/cx1.h:378-396, lives in
    parallel/sharded_build.py as the all_to_all capacity/overflow check).
  * "seeds"  (EP): per-seed searches sharded across devices; the wavefront
    kernel is already batched over seeds, so sharding its S axis runs
    independent searches per device with no cross-device traffic until the
    final host gather.
The graph lives replicated in HBM on every device (it is small relative to
the read stream, SURVEY.md section 2.10).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch"]


def make_mesh(
    n_devices: int | None = None, axis: str = "data", local: bool = False
) -> Mesh:
    """1-D device mesh; `local=True` restricts to this process's devices
    (per-host data/seed sharding under jax.distributed)."""
    devs = jax.local_devices() if local else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    """Place `arr` sharded on its leading dimension over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


