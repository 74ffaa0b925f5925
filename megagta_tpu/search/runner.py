"""Batch search runner: seeds in, contigs out, via the wavefront kernel.

Host-side orchestration around search/wavefront.py: builds start nodes for a
batch of seeds (both directions), runs the two jitted lockstep searches, and
reconstructs contigs from the trace arenas (the goal-selection and traceback
rules of hmm_graph_search.h:83-109,345-356).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import str_to_dna
from ..graph.sdbg import SdBG
from ..hmm.profile import PROTEIN, ProfileHMM
from ..seeds.translate import translate_codes
from .astar import HMMGraphSearch
from .wavefront import (
    NF_REAL,
    NI_NE,
    NI_NODE,
    NI_PARENT,
    NI_STATE,
    NI_STATE_NO,
    DeviceGraph,
    DeviceHMM,
    WavefrontConfig,
    wavefront_search_merged,
)

__all__ = ["BatchSearcher"]


def _make_start(hmm: ProfileHMM, start_state: int, framed_word: str, forward: bool, dbg: SdBG):
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
    lookup = codes if forward else (3 - codes)[::-1]
    node_id = int(dbg.lookup_edge(lookup))
    ints = np.array(
        [node_id, start_state + n_res, 0, 0, 0, n_res, -1, 0], np.int32
    )
    floats = np.array([score, real, 0.0], np.float64)
    return ints, floats


def _chain(trace_i, trace_f, idx):
    """Trace indices from `idx` back to the root (inclusive)."""
    out = []
    while idx >= 0:
        out.append(idx)
        idx = int(trace_i[idx, NI_PARENT])
        if idx == out[-1]:
            break
    return out


def _emission(trace_i, idx) -> str:
    if int(trace_i[idx, NI_STATE]) == 2:  # delete nodes emit nothing
        return ""
    ne = int(trace_i[idx, NI_NE])
    return "".join("acgt-"[(ne >> (3 * i)) & 7] for i in (2, 1, 0))


def _best_chain(trace_i, trace_f, inter_idx):
    """getHighestScoreNode: root..best chain (deepest max real_score)."""
    if inter_idx < 0:
        return []
    chain = _chain(trace_i, trace_f, int(inter_idx))  # child ... root
    best = chain[0]
    for idx in chain[1:]:
        if trace_f[idx, NF_REAL] > trace_f[best, NF_REAL]:
            best = idx
    upto = _chain(trace_i, trace_f, best)
    upto.reverse()  # root ... best
    return upto


def _contig_part(trace_i, trace_f, inter_idx) -> str:
    """getHighestScoreNode + partialResultFromGoal combined."""
    chain = _best_chain(trace_i, trace_f, inter_idx)
    return "".join(
        _emission(trace_i, idx) for idx in chain if int(trace_i[idx, NI_PARENT]) >= 0
    )


class _PathCache:
    """Host side of the cross-seed path cache (term-node equivalent).

    Holds identity -> (suffix string after the node on a goal path, max
    real_score downstream) plus the open-address device arrays probed by the
    wavefront kernel."""

    def __init__(self, size_log2: int = 21):
        self.H = 1 << size_log2
        self.keys_a = np.full(self.H, -1, np.int32)
        self.keys_b = np.full(self.H, -1, np.int32)
        self.vals = np.full(self.H, -1, np.int32)
        self.entries: list[tuple[str, float]] = []
        self.seen: set = set()
        self._device = None

    def device_tables(self):
        import jax.numpy as jnp

        if self._device is None:
            self._device = (
                jnp.asarray(self.keys_a),
                jnp.asarray(self.keys_b),
                jnp.asarray(self.vals),
            )
        return self._device

    def _insert(self, a: int, b: int, entry_idx: int):
        h = ((a * 2654435761) ^ (b * 40503)) & 0xFFFFFFFF
        for probe in range(4):
            idx = (h + probe) % self.H
            if self.keys_a[idx] == -1:
                self.keys_a[idx] = a
                self.keys_b[idx] = b
                self.vals[idx] = entry_idx
                return
        # table neighborhood full: drop (lossy cache)

    def harvest(self, trace_i, trace_f, inter_idx):
        """Insert every node of a completed goal path (first insert wins,
        like the reference HashMapST, src/fast... hmm_graph_search.h:102)."""
        chain = _best_chain(trace_i, trace_f, inter_idx)
        if len(chain) < 2:
            return
        emissions = [_emission(trace_i, idx) for idx in chain]
        end_real = float(trace_f[chain[-1], NF_REAL])
        # suffix after node j = emissions j+1..end
        suffixes = [""]
        for e in reversed(emissions[1:]):
            suffixes.append(e + suffixes[-1])
        suffixes.reverse()  # suffixes[j] = emissions after chain[j]
        dirty = False
        for j, idx in enumerate(chain):
            a = int(trace_i[idx, NI_NODE])
            b = (int(trace_i[idx, NI_STATE_NO]) << 2) | int(trace_i[idx, NI_STATE])
            if a < 0 or (a, b) in self.seen:
                continue
            self.seen.add((a, b))
            # real_score increments from this node onward are path-local, so
            # the downstream maximum is stored as a DELTA from this node's
            # score and translated into the hitting seed's accumulation
            delta_max = end_real - float(trace_f[idx, NF_REAL])
            self.entries.append((suffixes[j], delta_max))
            self._insert(a, b, len(self.entries) - 1)
            dirty = True
        if dirty:
            self._device = None

    def compose(self, trace_i, trace_f, cached_at: int, entry_idx: int) -> str:
        """Prefix emissions + cached suffix, with the reference's
        highest-real-score truncation over the composite chain."""
        suffix, delta_max = self.entries[entry_idx]
        chain = _chain(trace_i, trace_f, cached_at)  # hit ... root
        prefix_best = chain[0]
        for idx in chain[1:]:
            if trace_f[idx, NF_REAL] > trace_f[prefix_best, NF_REAL]:
                prefix_best = idx
        suffix_max = float(trace_f[chain[0], NF_REAL]) + delta_max
        if suffix_max >= float(trace_f[prefix_best, NF_REAL]):
            full = "".join(
                _emission(trace_i, idx)
                for idx in reversed(chain)
                if int(trace_i[idx, NI_PARENT]) >= 0
            )
            return full + suffix
        return _contig_part(trace_i, trace_f, cached_at)


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

    mesh: object = None  # jax.sharding.Mesh to shard the seed axis over

    def __post_init__(self):
        import dataclasses

        if self.config.dtype is not self.dtype:
            self.config = dataclasses.replace(self.config, dtype=self.dtype)
        self.graph = DeviceGraph.from_sdbg(self.dbg)
        self.dev_fwd = DeviceHMM.from_profile(self.fwd_hmm, self.fwd_h, self.dtype)
        self.dev_rev = DeviceHMM.from_profile(self.rev_hmm, self.rev_h, self.dtype)
        if self.fwd_hmm.model_length != self.rev_hmm.model_length:
            raise ValueError(
                "forward/reverse HMM lengths differ; the reverse model must "
                "be built from the column-reversed alignment"
            )
        self.hmm_stack = DeviceHMM.stack(self.dev_fwd, self.dev_rev)
        self.last_stats: dict = {}
        self.cache_f = _PathCache() if self.config.use_cache else None
        self.cache_r = _PathCache() if self.config.use_cache else None
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
            # warm the path cache with a small first chunk so the bulk of the
            # seeds short-circuit (the reference's term-node memo warms the
            # same way as its first seeds complete)
            warm = max(1, self.chunk // 8)
            out.extend(self._search_chunk(seeds[:warm], chunk=warm))
            start = warm
        for i in range(start, len(seeds), self.chunk):
            out.extend(self._search_chunk(seeds[i : i + self.chunk]))
        return out

    def _search_chunk(self, seeds: list[tuple[str, int]], chunk: int | None = None) -> list[str]:
        S = chunk or self.chunk
        divisor = 3 if self.fwd_hmm.alphabet == PROTEIN else 1
        si_f = np.zeros((S, 8), np.int32)
        sf_f = np.zeros((S, 3), np.float64)
        si_r = np.zeros((S, 8), np.int32)
        sf_r = np.zeros((S, 3), np.float64)
        si_f[:, 0] = -1  # padding seeds: absent node, no expansion
        si_r[:, 0] = -1
        for i, (nucl, ss) in enumerate(seeds):
            si_f[i], sf_f[i] = _make_start(self.fwd_hmm, ss, nucl, True, self.dbg)
            l_start = self.rev_hmm.model_length - ss - len(nucl) // divisor
            si_r[i], sf_r[i] = _make_start(self.rev_hmm, l_start, nucl, False, self.dbg)

        # one merged run: rows [0:S] forward, [S:2S] reverse
        if self.cache_f:
            fa, fb, fv = self.cache_f.device_tables()
            ra, rb, rv = self.cache_r.device_tables()
            tab = (
                jnp.stack([fa, ra]),
                jnp.stack([fb, rb]),
                jnp.stack([fv, rv]),
            )
        else:
            tab = (None, None, None)
        dirs = np.concatenate([np.zeros(S, np.int32), np.ones(S, np.int32)])
        res = wavefront_search_merged(
            self.graph,
            self.hmm_stack,
            self._place(jnp.asarray(dirs)),
            self._place(jnp.asarray(np.concatenate([si_f, si_r]))),
            self._place(jnp.asarray(np.concatenate([sf_f, sf_r]), self.dtype)),
            self.config,
            self.fwd_hmm.model_length,
            *tab,
        )
        self.last_stats["expansions"] += int(res["expansions"])
        self.last_stats["steps"] += int(res["steps"])
        self.last_stats["overflow"] += int(np.asarray(res["overflow"]).sum())

        t_i = np.asarray(res["trace_i"])
        t_f = np.asarray(res["trace_f"])
        tf_i, tr_i = t_i[:S], t_i[S:]
        tf_f, tr_f = t_f[:S], t_f[S:]
        inter = np.asarray(res["inter_idx"])
        inter_f, inter_r = inter[:S], inter[S:]
        ce = np.asarray(res["cached_entry"])
        ca = np.asarray(res["cached_at"])
        ce_f, ce_r = ce[:S], ce[S:]
        ca_f, ca_r = ca[:S], ca[S:]
        goal = np.asarray(res["goal_idx"])
        goal_f, goal_r = goal[:S], goal[S:]

        contigs = []
        for i, (nucl, _) in enumerate(seeds):
            if self.cache_f and ce_f[i] >= 0:
                right = self.cache_f.compose(tf_i[i], tf_f[i], int(ca_f[i]), int(ce_f[i]))
            else:
                right = _contig_part(tf_i[i], tf_f[i], inter_f[i])
                if self.cache_f is not None and goal_f[i] >= 0:
                    self.cache_f.harvest(tf_i[i], tf_f[i], inter_f[i])
            if self.cache_r and ce_r[i] >= 0:
                left = self.cache_r.compose(tr_i[i], tr_f[i], int(ca_r[i]), int(ce_r[i]))
            else:
                left = _contig_part(tr_i[i], tr_f[i], inter_r[i])
                if self.cache_r is not None and goal_r[i] >= 0:
                    self.cache_r.harvest(tr_i[i], tr_f[i], inter_r[i])
            left_rc = "".join(_COMP[c] for c in reversed(left))
            contigs.append(left_rc + nucl.lower() + right)
        self.last_stats["cache_hits"] = self.last_stats.get("cache_hits", 0) + int(
            (ce_f >= 0).sum() + (ce_r >= 0).sum()
        )
        return contigs
