"""Batch search runner: seeds in, contigs out, via the wavefront kernel.

Host-side orchestration around search/wavefront.py: builds start nodes for a
batch of seeds (both directions), runs the two jitted lockstep searches, and
reconstructs contigs from the trace arenas (the goal-selection and traceback
rules of hmm_graph_search.h:83-109,345-356).
"""

from __future__ import annotations

import math
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
    NF_MAX,
    NF_REAL,
    NF_SCORE,
    NI_LEN,
    NI_NE,
    NI_NODE,
    NI_PARENT,
    NI_STATE,
    NI_STATE_NO,
    DeviceGraph,
    DeviceHMM,
    WavefrontConfig,
    wavefront_search,
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


def _contig_part(trace_i, trace_f, inter_idx) -> str:
    """getHighestScoreNode + partialResultFromGoal combined."""
    if inter_idx < 0:
        return ""
    chain = _chain(trace_i, trace_f, int(inter_idx))  # child ... root
    best = chain[0]
    for idx in chain[1:]:
        if trace_f[idx, NF_REAL] > trace_f[best, NF_REAL]:
            best = idx
    parts = []
    for idx in _chain(trace_i, trace_f, best):
        if int(trace_i[idx, NI_PARENT]) < 0:
            break  # root (seed) emits nothing
        if int(trace_i[idx, NI_STATE]) != 2:  # delete nodes emit nothing
            ne = int(trace_i[idx, NI_NE])
            parts.append(
                "".join("acgt-"[(ne >> (3 * i)) & 7] for i in (2, 1, 0))
            )
    return "".join(reversed(parts))


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
        self.last_stats: dict = {}
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
        for i in range(0, len(seeds), self.chunk):
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
        for i, (nucl, ss) in enumerate(seeds):
            si_f[i], sf_f[i] = _make_start(self.fwd_hmm, ss, nucl, True, self.dbg)
            l_start = self.rev_hmm.model_length - ss - len(nucl) // divisor
            si_r[i], sf_r[i] = _make_start(self.rev_hmm, l_start, nucl, False, self.dbg)

        res_f = wavefront_search(
            self.graph,
            self.dev_fwd,
            self._place(jnp.asarray(si_f)),
            self._place(jnp.asarray(sf_f, self.dtype)),
            self.config,
            True,
            self.fwd_hmm.model_length,
        )
        res_r = wavefront_search(
            self.graph,
            self.dev_rev,
            self._place(jnp.asarray(si_r)),
            self._place(jnp.asarray(sf_r, self.dtype)),
            self.config,
            False,
            self.rev_hmm.model_length,
        )
        self.last_stats["expansions"] += int(res_f["expansions"]) + int(
            res_r["expansions"]
        )
        self.last_stats["steps"] += int(res_f["steps"]) + int(res_r["steps"])
        self.last_stats["overflow"] += int(np.asarray(res_f["overflow"]).sum()) + int(
            np.asarray(res_r["overflow"]).sum()
        )

        tf_i = np.asarray(res_f["trace_i"])
        tf_f = np.asarray(res_f["trace_f"])
        tr_i = np.asarray(res_r["trace_i"])
        tr_f = np.asarray(res_r["trace_f"])
        inter_f = np.asarray(res_f["inter_idx"])
        inter_r = np.asarray(res_r["inter_idx"])

        contigs = []
        for i, (nucl, _) in enumerate(seeds):
            right = _contig_part(tf_i[i], tf_f[i], inter_f[i])
            left = _contig_part(tr_i[i], tr_f[i], inter_r[i])
            left_rc = "".join(_COMP[c] for c in reversed(left))
            contigs.append(left_rc + nucl.lower() + right)
        return contigs
