"""Device mesh + sharding strategies.

The reference is single-host shared-memory (SURVEY.md section 2.10); the
TPU-native scale-out axes are:
  * "reads"  (DP): read batches sharded across devices for k-mer counting;
    partial 65536-bucket histograms merged with psum (the CX1 lv0 histogram,
    src/cx1.h:378-396, as one collective).
  * "seeds"  (EP): per-seed searches sharded across devices; the wavefront
    kernel is already batched over seeds, so sharding its S axis runs
    independent searches per device with no cross-device traffic until the
    final host gather.
The graph lives replicated in HBM on every device (it is small relative to
the read stream, SURVEY.md section 2.10).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "sharded_bucket_histogram",
    "NUM_BUCKETS",
]

NUM_BUCKETS = 1 << 16  # 4^8 prefix buckets (reference kNumBuckets,
# src/cx1_read2sdbg.h:64-66)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    """Place `arr` sharded on its leading dimension over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def _bucket_keys(windows_packed: jnp.ndarray) -> jnp.ndarray:
    """First-8-char bucket id from packed window keys ([N] uint32 holding the
    leading 16 bases 2-bit packed big-endian)."""
    return (windows_packed >> jnp.uint32(16)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_buckets",))
def bucket_histogram(prefix_words: jnp.ndarray, valid: jnp.ndarray, num_buckets: int = NUM_BUCKETS):
    """[N] uint32 leading-word keys -> [num_buckets] int32 histogram."""
    keys = _bucket_keys(prefix_words)
    keys = jnp.where(valid, keys, num_buckets)  # invalid -> overflow slot
    hist = jnp.zeros(num_buckets + 1, jnp.int32).at[keys].add(1)
    return hist[:num_buckets]


def sharded_bucket_histogram(mesh: Mesh, prefix_words, valid, axis: str = "data"):
    """DP counting: per-device partial histograms merged with psum."""
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    def _go(pw, v):
        part = bucket_histogram(pw, v)
        return jax.lax.psum(part, axis)

    return jax.jit(_go)(prefix_words, valid)
