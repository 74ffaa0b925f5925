"""Batch search runner: seeds in, contigs out, via the wavefront kernel.

Host-side orchestration around search/wavefront.py: builds start nodes for a
batch of seeds (both directions), runs the two jitted lockstep searches, and
reconstructs contigs from compact device-extracted parent chains (the
goal-selection and traceback rules of hmm_graph_search.h:83-109,345-356).

Data-movement design (the TPU here sits behind a network tunnel, so
host<->device bytes are the scarcest resource):
  * traceback runs ON DEVICE (wavefront.extract_chains); only [rows, maxc]
    compact chains come back, never the [rows, T, 8] trace arenas;
  * the cross-seed path-cache tables live on device permanently and are
    updated by scattering just the new entries (donated buffers), never
    re-uploaded.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import str_to_dna
from ..graph.sdbg import SdBG
from ..hmm.profile import PROTEIN, ProfileHMM
from ..seeds.translate import translate_codes
from .astar import HMMGraphSearch
from .wavefront import (
    DeviceGraph,
    DeviceHMM,
    WavefrontConfig,
    extract_chains,
    wavefront_search_merged,
)

__all__ = ["BatchSearcher"]


def _make_start(
    hmm: ProfileHMM,
    start_state: int,
    framed_word: str,
    forward: bool,
    dbg: SdBG,
    node_id: int | None = None,
):
    codes = str_to_dna(framed_word)
    if hmm.alphabet == PROTEIN:
        aa = translate_codes(codes)
        if not forward:
            aa = aa[::-1]
        n_res = len(framed_word) // 3
    else:
        aa = codes
        n_res = len(framed_word)
    score, real = HMMGraphSearch.score_start(hmm, aa, start_state)
    if node_id is None:
        lookup = codes if forward else (3 - codes)[::-1]
        node_id = int(dbg.lookup_edge(lookup))
    ints = np.array(
        [node_id, start_state + n_res, 0, 0, 0, n_res, -1, 0], np.int32
    )
    floats = np.array([score, real, 0.0], np.float64)
    return ints, floats


def _batch_lookup(dbg: SdBG, seeds: list[tuple[str, int]]) -> tuple[np.ndarray, np.ndarray]:
    """Edge rows for all seeds' forward + reverse-complement words in as few
    vectorized lookup_edges calls as word lengths require."""
    fwd = np.full(len(seeds), -1, np.int64)
    rev = np.full(len(seeds), -1, np.int64)
    by_len: dict[int, list[int]] = {}
    codes_all = []
    for i, (nucl, _) in enumerate(seeds):
        codes = str_to_dna(nucl)
        codes_all.append(codes)
        by_len.setdefault(len(codes), []).append(i)
    for n, idxs in by_len.items():
        fw = np.stack([codes_all[i] for i in idxs])
        fwd[idxs] = dbg.lookup_edges(fw)
        rev[idxs] = dbg.lookup_edges((3 - fw)[:, ::-1])
    return fwd, rev


# ---- compact chain helpers (child -> root order; packed = ne | state<<9 |
# state_no<<11, -1 past the end) ------------------------------------------

_EMIT_LUT = np.frombuffer(b"acgt-???", dtype=np.uint8)


def _contigs_from_chains(packed: np.ndarray, reals: np.ndarray) -> list[str]:
    """Vectorized getHighestScoreNode + partialResultFromGoal over all rows.

    packed/reals: [R, C]. Per row: best = first max real_score scanning
    tip->root; contig = emissions of chain indices n-2 .. best in root->tip
    order (delete states emit nothing)."""
    R, C = packed.shape
    valid = packed >= 0
    n = valid.sum(axis=1)
    rm = np.where(valid, reals, -np.inf)
    best = np.argmax(rm, axis=1)  # first occurrence == reference replace rule
    ne = packed & 0x1FF
    state = (packed >> 9) & 3
    chars = np.stack(
        [_EMIT_LUT[(ne >> 6) & 7], _EMIT_LUT[(ne >> 3) & 7], _EMIT_LUT[ne & 7]],
        axis=2,
    )  # [R, C, 3]
    idx = np.arange(C)[None, :]
    keep = (
        valid
        & (state != 2)
        & (idx >= best[:, None])
        & (idx <= (n - 2)[:, None])
    )
    chars_f = chars[:, ::-1]
    keep_f = keep[:, ::-1]
    return [chars_f[r][keep_f[r]].tobytes().decode() for r in range(R)]


def _n_valid(packed: np.ndarray) -> int:
    valid = packed >= 0
    return int(valid.sum())


def _emission_packed(packed: int) -> str:
    state = (packed >> 9) & 3
    if state == 2:  # delete nodes emit nothing
        return ""
    ne = packed & 0x1FF
    return "".join("acgt-"[(ne >> (3 * i)) & 7] for i in (2, 1, 0))


def _first_max(reals: np.ndarray, n: int) -> int:
    """Index of the max real_score, first occurrence scanning tip->root
    (getHighestScoreNode's strict-greater replacement rule == argmax's
    first-occurrence tie-break)."""
    return int(np.argmax(reals[:n])) if n else 0


def _contig_from_chain(packed: np.ndarray, reals: np.ndarray) -> str:
    """getHighestScoreNode + partialResultFromGoal combined."""
    n = _n_valid(packed)
    if n == 0:
        return ""
    best = _first_max(reals, n)
    # root..best, root itself emits nothing (trace parent < 0)
    return "".join(_emission_packed(int(packed[i])) for i in range(n - 2, best - 1, -1))


class _PathCache:
    """Host side of the cross-seed path cache (term-node equivalent).

    Holds identity -> (suffix string after the node on a goal path, max
    real_score downstream). The bucketized table probed by the wavefront
    kernel lives on device as [2, HB, 16] rows (4 slots: cols 0-3 key a,
    4-7 key b, 8-11 entry index — one 64 B row gather per probe);
    `pending` accumulates (bucket, slot, a, b, val) scatter updates."""

    def __init__(self, size_log2: int = 19):
        self.HB = 1 << size_log2  # buckets of 4 slots
        self.fill = np.zeros(self.HB, np.int8)
        self.entries: list[tuple[str, float]] = []
        self.seen: set = set()
        self.pending: list[tuple[int, int, int, int, int]] = []

    def _insert(self, a: int, b: int, entry_idx: int):
        h = ((a * 2654435761) ^ (b * 40503)) & 0xFFFFFFFF
        bk = h % self.HB
        slot = int(self.fill[bk])
        if slot >= 4:
            return  # bucket full: drop (lossy cache)
        self.fill[bk] = slot + 1
        self.pending.append((bk, slot, a, b, entry_idx))

    def harvest(self, nodes: np.ndarray, packed: np.ndarray, reals: np.ndarray):
        """Insert every node of a completed goal path (first insert wins,
        like the reference HashMapST, hmm_graph_search.h:83-109)."""
        n = _n_valid(packed)
        if n == 0:
            return
        best = _first_max(reals, n)
        # best-chain in root -> best order = chain indices n-1 .. best
        ci = list(range(n - 1, best - 1, -1))
        if len(ci) < 2:
            return
        emissions = [_emission_packed(int(packed[i])) for i in ci]
        end_real = float(reals[ci[-1]])
        suffixes = [""]
        for e in reversed(emissions[1:]):
            suffixes.append(e + suffixes[-1])
        suffixes.reverse()  # suffixes[j] = emissions after ci[j]
        for j, i in enumerate(ci):
            a = int(nodes[i])
            p = int(packed[i])
            b = (p >> 11 << 2) | ((p >> 9) & 3)
            if a < 0 or (a, b) in self.seen:
                continue
            self.seen.add((a, b))
            # real_score increments from this node onward are path-local, so
            # the downstream maximum is stored as a DELTA from this node's
            # score and translated into the hitting seed's accumulation
            delta_max = end_real - float(reals[i])
            self.entries.append((suffixes[j], delta_max))
            self._insert(a, b, len(self.entries) - 1)

    def compose(self, packed: np.ndarray, reals: np.ndarray, entry_idx: int) -> str:
        """Prefix emissions + cached suffix, with the reference's
        highest-real-score truncation over the composite chain. Chain
        entry 0 is the cache-hit node."""
        suffix, delta_max = self.entries[entry_idx]
        n = _n_valid(packed)
        prefix_best = _first_max(reals, n)
        suffix_max = float(reals[0]) + delta_max
        if suffix_max >= float(reals[prefix_best]):
            full = "".join(
                _emission_packed(int(packed[i])) for i in range(n - 2, -1, -1)
            )
            return full + suffix
        return _contig_from_chain(packed, reals)


@partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _cache_scatter(tab, d, buckets, slots, na, nb, nv):
    """Scatter new cache entries into the persistent device bucket table.

    tab: [2, HB, 16]. Out-of-range buckets (the padding) are dropped."""
    tab = tab.at[d, buckets, slots].set(na, mode="drop")
    tab = tab.at[d, buckets, slots + 4].set(nb, mode="drop")
    tab = tab.at[d, buckets, slots + 8].set(nv, mode="drop")
    return tab


_COMP = {"a": "t", "c": "g", "g": "c", "t": "a", "-": "-"}


@dataclass
class BatchSearcher:
    dbg: SdBG
    fwd_hmm: ProfileHMM
    rev_hmm: ProfileHMM
    fwd_h: np.ndarray
    rev_h: np.ndarray
    config: WavefrontConfig
    dtype: object = jnp.float32
    chunk: int = 128  # seeds per device batch (fixed shape: one compile,
    # bounded pool memory; the last chunk is padded with absent seeds)
    maxc: int = 512  # chain-extraction cap; grows 4x on truncation

    mesh: object = None  # jax.sharding.Mesh to shard the seed axis over

    def __post_init__(self):
        import dataclasses

        if self.config.dtype is not self.dtype:
            self.config = dataclasses.replace(self.config, dtype=self.dtype)
        self.graph = DeviceGraph.from_sdbg(self.dbg, self.config.precompute_hops)
        self.dev_fwd = DeviceHMM.from_profile(self.fwd_hmm, self.fwd_h, self.dtype)
        self.dev_rev = DeviceHMM.from_profile(self.rev_hmm, self.rev_h, self.dtype)
        # Independently hmmbuilt fwd/rev models (bin/prepare_gene_ref.sh runs
        # hmmbuild twice) may disagree by a column; the merged fwd+rev run
        # needs one model length, so unequal models fall back to two
        # direction-homogeneous runs (reference runs them separately anyway,
        # src/search.cpp:124-162).
        self.merged = self.fwd_hmm.model_length == self.rev_hmm.model_length
        if self.merged:
            self.hmm_stack = DeviceHMM.stack(self.dev_fwd, self.dev_rev)
        else:
            self.hmm_stack_f = DeviceHMM.stack(self.dev_fwd, self.dev_fwd)
            self.hmm_stack_r = DeviceHMM.stack(self.dev_rev, self.dev_rev)
        self.last_stats: dict = {}
        self.cache_f = _PathCache() if self.config.use_cache else None
        self.cache_r = _PathCache() if self.config.use_cache else None
        self._dev_cache = None
        if self.mesh is not None:
            n = self.mesh.devices.size
            if self.chunk % n:
                self.chunk = ((self.chunk + n - 1) // n) * n

    def _place(self, arr):
        """Shard the seed axis over the mesh (EP axis, SURVEY.md 2.10)."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        return jax.device_put(arr, NamedSharding(self.mesh, P(axis)))

    def _cache_tables(self):
        """Persistent device table, updated by scattering pending entries."""
        HB = self.cache_f.HB
        if self._dev_cache is None:
            self._dev_cache = jnp.full((2, HB, 16), -1, jnp.int32)
        for d, cache in ((0, self.cache_f), (1, self.cache_r)):
            if not cache.pending:
                continue
            n = len(cache.pending)
            pad = 1 << max(6, (n - 1).bit_length())
            upd = np.full((pad, 5), HB, np.int64)  # bucket HB = dropped
            upd[:n] = cache.pending
            cache.pending = []
            self._dev_cache = _cache_scatter(
                self._dev_cache,
                d,
                jnp.asarray(upd[:, 0], jnp.int32),
                jnp.asarray(upd[:, 1] % 4, jnp.int32),
                jnp.asarray(upd[:, 2], jnp.int32),
                jnp.asarray(upd[:, 3], jnp.int32),
                jnp.asarray(upd[:, 4], jnp.int32),
            )
        return self._dev_cache

    def search(self, seeds: list[tuple[str, int]]) -> list[str]:
        """seeds: [(nucl lowercase, start_state 0-based)] -> contigs."""
        if not seeds:
            return []
        self.last_stats = {"expansions": 0, "steps": 0, "overflow": 0}
        out: list[str] = []
        start = 0
        if (
            self.cache_f is not None
            and not self.cache_f.entries
            and len(seeds) > self.chunk
        ):
            # warm the path cache with a small first batch so the bulk of
            # the seeds short-circuit (the reference's term-node memo warms
            # the same way as its first seeds complete); padded to the
            # standard chunk shape so no extra compilation happens
            warm = max(1, self.chunk // 8)
            out.extend(self._search_chunk(seeds[:warm]))
            start = warm
        for i in range(start, len(seeds), self.chunk):
            out.extend(self._search_chunk(seeds[i : i + self.chunk]))
        return out

    def _search_chunk(self, seeds: list[tuple[str, int]]) -> list[str]:
        S = self.chunk
        divisor = 3 if self.fwd_hmm.alphabet == PROTEIN else 1
        si_f = np.zeros((S, 8), np.int32)
        sf_f = np.zeros((S, 3), np.float64)
        si_r = np.zeros((S, 8), np.int32)
        sf_r = np.zeros((S, 3), np.float64)
        si_f[:, 0] = -1  # padding seeds: absent node, no expansion
        si_r[:, 0] = -1
        si_f[:, 6] = -1  # padding parent: root (traceback terminator)
        si_r[:, 6] = -1
        node_f, node_r = _batch_lookup(self.dbg, seeds)
        for i, (nucl, ss) in enumerate(seeds):
            si_f[i], sf_f[i] = _make_start(
                self.fwd_hmm, ss, nucl, True, self.dbg, int(node_f[i])
            )
            l_start = self.rev_hmm.model_length - ss - len(nucl) // divisor
            si_r[i], sf_r[i] = _make_start(
                self.rev_hmm, l_start, nucl, False, self.dbg, int(node_r[i])
            )

        # one merged run: rows [0:S] forward, [S:2S] reverse
        tab = self._cache_tables() if self.cache_f else None
        if self.merged:
            dirs = np.concatenate([np.zeros(S, np.int32), np.ones(S, np.int32)])
            res = wavefront_search_merged(
                self.graph,
                self.hmm_stack,
                self._place(jnp.asarray(dirs)),
                self._place(jnp.asarray(np.concatenate([si_f, si_r]))),
                self._place(jnp.asarray(np.concatenate([sf_f, sf_r]), self.dtype)),
                self.config,
                self.fwd_hmm.model_length,
                tab,
            )
        else:
            # unequal model lengths: one homogeneous run per direction,
            # results concatenated into the merged row layout [0:S] fwd,
            # [S:2S] rev (parent indices in trace3 are row-local, so plain
            # axis-0 concatenation preserves traceback)
            halves = []
            for stack, hmm_, si, sf, d in (
                (self.hmm_stack_f, self.fwd_hmm, si_f, sf_f, 0),
                (self.hmm_stack_r, self.rev_hmm, si_r, sf_r, 1),
            ):
                halves.append(
                    wavefront_search_merged(
                        self.graph,
                        stack,
                        self._place(jnp.full((S,), d, jnp.int32)),
                        self._place(jnp.asarray(si)),
                        self._place(jnp.asarray(sf, self.dtype)),
                        self.config,
                        hmm_.model_length,
                        tab,
                    )
                )
            rf, rr = halves
            res = {
                k: (
                    rf[k] + rr[k]
                    if k in ("expansions", "steps")
                    else jnp.concatenate(
                        [jnp.atleast_1d(rf[k]), jnp.atleast_1d(rr[k])], axis=0
                    )
                )
                for k in rf
            }
        self.last_stats["expansions"] += int(res["expansions"])
        self.last_stats["steps"] += int(res["steps"])
        self.last_stats["overflow"] += int(np.asarray(res["overflow"]).sum())

        # device-side traceback: cache-hit rows trace from the hit node,
        # everything else from the inter goal
        start_idx = jnp.where(
            res["cached_at"] >= 0, res["cached_at"], res["inter_idx"]
        )
        while True:
            dnodes, dpacked, dreals = extract_chains(
                res["trace3"], res["treal"], start_idx, self.maxc,
            )
            # slice to the longest actual chain before pulling to the host:
            # the tunnel downloads at ~20 MB/s, so bytes are the cost
            lmax = int(jnp.max(jnp.sum(dpacked >= 0, axis=1)))
            if lmax < self.maxc:
                c = max(lmax, 1)
                dnodes, dpacked, dreals = (
                    dnodes[:, :c], dpacked[:, :c], dreals[:, :c]
                )
            nodes = np.asarray(dnodes)
            packed = np.asarray(dpacked)
            reals = np.asarray(dreals, np.float64)
            if lmax < self.maxc:
                break
            self.maxc *= 4  # truncated chain: retry deeper (rare)

        ce = np.asarray(res["cached_entry"])
        goal = np.asarray(res["goal_idx"])
        ce_f, ce_r = ce[:S], ce[S:]
        goal_f, goal_r = goal[:S], goal[S:]

        plain = _contigs_from_chains(packed, reals)
        contigs = []
        for i, (nucl, _) in enumerate(seeds):
            if self.cache_f and ce_f[i] >= 0:
                right = self.cache_f.compose(packed[i], reals[i], int(ce_f[i]))
            else:
                right = plain[i]
                if self.cache_f is not None and goal_f[i] >= 0:
                    self.cache_f.harvest(nodes[i], packed[i], reals[i])
            j = S + i
            if self.cache_r and ce_r[i] >= 0:
                left = self.cache_r.compose(packed[j], reals[j], int(ce_r[i]))
            else:
                left = plain[j]
                if self.cache_r is not None and goal_r[i] >= 0:
                    self.cache_r.harvest(nodes[j], packed[j], reals[j])
            left_rc = "".join(_COMP[c] for c in reversed(left))
            contigs.append(left_rc + nucl.lower() + right)
        self.last_stats["cache_hits"] = self.last_stats.get("cache_hits", 0) + int(
            (ce_f >= 0).sum() + (ce_r >= 0).sum()
        )
        return contigs
