"""Keyspace-sharded (k+1)-mer counting over a device mesh.

The multi-device mapping of the reference's CX1 bucket pipeline
(src/cx1.h:204-303, 65536 prefix buckets scanned in RAM-sized passes): reads
are data-parallel across devices; each device extracts its local window
keys, partitions them by the KEY PREFIX that owns them, and one all_to_all
exchange routes every occurrence to its owner. Because the owner ranges are
contiguous in key space, a run (all occurrences of one k-mer) never crosses
devices, so per-device local sorts + run-length encoding produce per-device
distinct-edge lists whose device-order concatenation is the globally sorted
distinct-edge relation — bit-identical input to the BOSS row derivation
(graph/device_builder._phase2).

Send capacity is provisioned at `balance` x the uniform share; an overflow
counter is returned and the host transparently retries with full capacity
(correctness never depends on balance)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.device_builder import _phase2, _round_up_pow2
from ..graph.sdbg import SdBG  # noqa: F401 (re-export for callers)
from ..io.read_lib import ReadPackage
from ..ops.kmer_device import (
    UMAX,
    count_sorted,
    pack_reads_device,
    rc_keys,
    window_keys,
)

__all__ = ["build_sdbg_sharded", "sharded_counted_edges"]


def _exchange_count_fn(
    k1: int, min_count: int, D: int, C: int, axis: str, masked: bool = False
):
    """shard_map body: local keys -> all_to_all by prefix -> local count.

    masked: a third [R, P] bool input restricts counting to solid windows
    (the mercy mask, reference s2 solid-window semantics,
    cx1_read2sdbg_s2.cpp:106-250); the mask already encodes solidity so the
    min_count filter is skipped, matching device_builder._phase1."""
    tbits = D.bit_length() - 1
    assert (1 << tbits) == D, "device count must be a power of two"

    def fn(padded_l, lens_l, mask_l=None):
        words = pack_reads_device(padded_l)
        fwd, valid = window_keys(words, lens_l[:, 0], k1)
        if masked:
            gap = valid.shape[1] - mask_l.shape[1]
            if gap:
                mask_l = jnp.pad(mask_l, ((0, 0), (0, gap)))
            valid = valid & mask_l
            fwd = jnp.where(valid[..., None], fwd, UMAX)
        rc = rc_keys(fwd, k1)
        palin = (fwd == rc).all(axis=-1)
        rc = jnp.where((valid & ~palin)[..., None], rc, UMAX)
        allk = jnp.concatenate([fwd.reshape(-1, 3), rc.reshape(-1, 3)])
        m = allk.shape[0]

        # local sort: orders by owner prefix too (owner = top key bits)
        s0, s1, s2 = jax.lax.sort(
            (allk[:, 0], allk[:, 1], allk[:, 2]), num_keys=3
        )
        ok = (s0 != UMAX) | (s1 != UMAX) | (s2 != UMAX)
        tgt = (s0 >> jnp.uint32(32 - tbits)).astype(jnp.int32) if tbits else (
            jnp.zeros(m, jnp.int32)
        )
        idx = jnp.arange(m, dtype=jnp.int32)
        seg_change = jnp.ones(m, bool).at[1:].set(tgt[1:] != tgt[:-1])
        seg_start = jax.lax.cummax(jnp.where(seg_change, idx, 0))
        rank = idx - seg_start
        fits = ok & (rank < C)
        overflow = (ok & (rank >= C)).sum(dtype=jnp.int32)
        slot = jnp.where(fits, tgt * C + rank, D * C)
        buf = jnp.full((D * C, 3), UMAX)
        buf = buf.at[slot, 0].set(s0, mode="drop")
        buf = buf.at[slot, 1].set(s1, mode="drop")
        buf = buf.at[slot, 2].set(s2, mode="drop")
        recv = jax.lax.all_to_all(
            buf.reshape(D, C, 3), axis, split_axis=0, concat_axis=0
        )

        # local count over the received multiset (one owner per run)
        sk, boundary, valid2 = count_sorted(recv.reshape(D * C, 3))
        M = D * C
        pidx = jnp.arange(M, dtype=jnp.int32)
        arr = jnp.where(boundary, pidx, M)
        sufmin = jax.lax.cummin(arr[::-1])[::-1]
        ns = jnp.concatenate([sufmin[1:], jnp.full((1,), M, jnp.int32)])
        mult = ns - pidx
        edge_ok = boundary & valid2
        if min_count > 1 and not masked:
            edge_ok = edge_ok & (mult >= min_count)
        n_edges = edge_ok.sum(dtype=jnp.int32)
        ckey = jnp.where(edge_ok, pidx, M)
        _, e0, e1, e2, ms = jax.lax.sort(
            (ckey, sk[:, 0], sk[:, 1], sk[:, 2], mult),
            num_keys=1, is_stable=True,
        )
        edges = jnp.stack([e0, e1, e2], axis=-1)
        return (
            edges[None],
            ms[None],
            n_edges[None],
            overflow[None],
        )

    return fn


def sharded_counted_edges(
    mesh: Mesh,
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    balance: float = 2.0,
    axis: str | None = None,
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
):
    """Distinct (k+1)-mer edges + multiplicities, counted across the mesh.

    Returns (edges [Ne, 3] uint32 np, mult [Ne] int32 np) in global sorted
    key order — identical to the single-device phase-1 output.

    solid_mask: flat per-window mercy mask for `package`'s reads (same
    layout as device_builder._padded_window_mask input); trailing
    `num_assist` reads are always solid.

    CROSS-HOST: when `mesh` is a global mesh spanning several processes,
    `package` (and solid_mask) is this HOST's read slice — each host feeds
    its local shard chunk, the prefix all_to_all routes occurrences over
    ICI/DCN, and the per-device distinct-edge shards are allgathered so
    every host returns the identical global relation (the mesh equivalent
    of the reference's parallel bucket partition, cx1.h:204-303, with the
    file-merge step replaced by a collective)."""
    from jax import shard_map

    axis = axis or mesh.axis_names[0]
    D = mesh.devices.size
    Dl = jax.local_device_count()
    multihost = D > Dl
    k1 = k + 1
    padded, lens = package.padded()
    mask = None
    if solid_mask is not None:
        from ..graph.device_builder import _padded_window_mask

        Pw = max(padded.shape[1] - k1 + 1, 1)
        mask = _padded_window_mask(package, k1, Pw, solid_mask, num_assist)

    if multihost:
        from jax.experimental import multihost_utils as mh

        # common local shapes across hosts (global arrays need equal
        # per-process chunks): pad rows/width to the fleet maxima
        dims = np.asarray(
            mh.process_allgather(
                jnp.asarray([padded.shape[0], padded.shape[1]])
            )
        ).reshape(-1, 2)
        Rl = -(-int(dims[:, 0].max()) // Dl) * Dl
        Ll = int(dims[:, 1].max())
        padded = np.pad(
            padded, ((0, Rl - padded.shape[0]), (0, Ll - padded.shape[1]))
        )
        lens = np.pad(lens, (0, Rl - len(lens)))
        if mask is not None:
            mask = np.pad(
                mask,
                ((0, Rl - mask.shape[0]), (0, Ll - k1 + 1 - mask.shape[1])),
            )
        n_proc = D // Dl
        R_total = Rl * n_proc
        put = lambda a: mh.host_local_array_to_global_array(  # noqa: E731
            a, mesh, P(axis)
        )
    else:
        R = len(lens)
        Rpad = -R % D
        if Rpad:
            padded = np.pad(padded, ((0, Rpad), (0, 0)))
            lens = np.pad(lens, (0, Rpad))
            if mask is not None:
                mask = np.pad(mask, ((0, Rpad), (0, 0)))
        R_total = len(lens)
        sharding = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(jnp.asarray(a), sharding)  # noqa: E731

    m_local = 2 * (R_total // D) * max(padded.shape[1] - k1 + 1, 1)
    padded_d = put(padded)
    lens_d = put(np.asarray(lens, np.int32)[:, None])
    args = (padded_d, lens_d)
    if mask is not None:
        args = args + (put(mask),)

    def run(C):
        fn = shard_map(
            _exchange_count_fn(
                k1, min_count, D, C, axis, masked=mask is not None
            ),
            mesh=mesh,
            in_specs=(P(axis),) * len(args),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )
        return jax.jit(fn)(*args)

    def collect(g):
        """Global [D, ...] array -> host numpy on EVERY process."""
        if not multihost:
            return np.asarray(g)
        from jax.experimental import multihost_utils as mh

        shards = sorted(g.addressable_shards, key=lambda s: s.index[0].start)
        loc = np.concatenate([np.asarray(s.data) for s in shards])
        # jax.devices() (hence the 1-D mesh) is process-major, so stacking
        # allgathered per-host chunks reproduces device order
        gath = np.asarray(mh.process_allgather(jnp.asarray(loc), tiled=False))
        return gath.reshape((D,) + loc.shape[1:])

    C = min(m_local, max(128, -(-int(balance * m_local) // D) // 128 * 128))
    edges, mult, counts, overflow = run(C)
    if int(collect(overflow).sum()):
        # skewed prefixes: retry with loss-proof capacity
        edges, mult, counts, overflow = run(m_local)
        assert int(collect(overflow).sum()) == 0
    counts = collect(counts)
    edges = collect(edges)
    mult = collect(mult)
    return (
        np.concatenate([edges[d, : counts[d]] for d in range(D)]),
        np.concatenate([mult[d, : counts[d]] for d in range(D)]),
    )


def build_sdbg_sharded(
    mesh: Mesh,
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    balance: float = 2.0,
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
) -> SdBG:
    """Mesh-sharded counting + replicated BOSS row derivation; bit-identical
    to graph/device_builder.build_sdbg_device and to the host builder.
    Under a multi-process global mesh, `package` is this host's read slice
    and every host returns the identical SdBG (no process-0 funnel)."""
    from ..graph import device_builder as DB

    edges, mult = sharded_counted_edges(
        mesh, package, k, min_count, balance,
        solid_mask=solid_mask, num_assist=num_assist,
    )
    n_edges = len(edges)
    E = _round_up_pow2(max(n_edges, 1))
    ek = np.full((E, 3), np.uint32(0xFFFFFFFF), np.uint32)
    ek[:n_edges] = edges
    ms = np.zeros(E, np.int32)
    ms[:n_edges] = mult
    res = _phase2(jnp.asarray(ek), jnp.asarray(ms), jnp.int32(n_edges), k)
    return DB.sdbg_from_phase2(res, k)
