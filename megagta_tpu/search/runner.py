"""Batch search runner: seeds in, contigs out, via the wavefront kernel.

Host-side orchestration around search/wavefront.py: builds start nodes for a
batch of seeds (both directions), runs the two jitted lockstep searches, and
reconstructs contigs from compact device-extracted parent chains (the
goal-selection and traceback rules of hmm_graph_search.h:83-109,345-356).

Data-movement design (the TPU here sits behind a network tunnel, so
host<->device bytes AND round trips are the scarcest resources):
  * the trace arenas are sliced on device to the actual trace length
    (known once the step counter is fetched) before traceback;
  * traceback runs ON DEVICE (wavefront.extract_chains, a backward sweep +
    one sort); only [rows, lmax] compact chains come back, stacked into a
    single transfer — never the [rows, T, 8] trace arenas;
  * every small per-seed output rides in ONE packed array (`meta`) and the
    scalars in another (`scal`): three host fetches per chunk total;
  * the cross-seed path-cache tables live on device permanently and are
    updated by scattering just the new entries (donated buffers), never
    re-uploaded;
  * all per-seed host math (start scoring, contig/suffix assembly) is
    vectorized numpy over the chunk; contig strings are slices of one
    shared per-row emission string.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CODON_TABLE_FLAT, str_to_dna
from ..graph.sdbg import SdBG
from ..hmm.profile import MM, PROTEIN, ProfileHMM
from .wavefront import (
    DeviceGraph,
    DeviceHMM,
    WavefrontConfig,
    extract_chains,
    wavefront_search_merged,
)

__all__ = ["BatchSearcher"]


def _make_starts(
    hmm: ProfileHMM,
    codes: np.ndarray,  # [N, n] DNA codes (one length group)
    start_states: np.ndarray,  # [N]
    node_ids: np.ndarray,  # [N]
    forward: bool,
):
    """Vectorized start-node construction (start scoring of
    hmm_graph_search.h:112-130 over a whole seed batch).

    The per-residue accumulation stays a sequential Python loop over the
    ~15 seed residues (vectorized across seeds) so the float64 summation
    order is bit-identical to the serial oracle's score_start."""
    N, n = codes.shape
    if hmm.alphabet == PROTEIN:
        c = codes.reshape(N, -1, 3).astype(np.int64)
        aa = CODON_TABLE_FLAT[c[:, :, 0] * 16 + c[:, :, 1] * 4 + c[:, :, 2]]
        if not forward:
            aa = aa[:, ::-1]
        n_res = n // 3
    else:
        aa = codes.astype(np.int64)
        n_res = n
    ss = start_states.astype(np.int64)
    real = np.zeros(N, np.float64)
    score = np.zeros(N, np.float64)
    for i in range(n_res):
        col = ss + 1 + i
        mt = hmm.msc[col, aa[:, i]] + hmm.trans[col - 1, MM]
        real += mt
        score += mt - hmm.mme[col]
    ints = np.zeros((N, 8), np.int32)
    ints[:, 0] = node_ids
    ints[:, 1] = ss + n_res
    ints[:, 5] = n_res
    ints[:, 6] = -1
    floats = np.zeros((N, 3), np.float64)
    floats[:, 0] = score
    floats[:, 1] = real
    return ints, floats


def _make_start(
    hmm: ProfileHMM,
    start_state: int,
    framed_word: str,
    forward: bool,
    dbg: SdBG,
    node_id: int | None = None,
):
    """Single-seed convenience wrapper over _make_starts."""
    codes = str_to_dna(framed_word)
    if node_id is None:
        lookup = codes if forward else (3 - codes)[::-1]
        node_id = int(dbg.lookup_edge(lookup))
    ints, floats = _make_starts(
        hmm,
        codes[None, :],
        np.array([start_state], np.int64),
        np.array([node_id], np.int64),
        forward,
    )
    return ints[0], floats[0]


def _batch_lookup(dbg: SdBG, seeds: list[tuple[str, int]]):
    """Edge rows + code arrays for all seeds' forward + reverse-complement
    words, grouped by word length (one vectorized lookup per group)."""
    fwd = np.full(len(seeds), -1, np.int64)
    rev = np.full(len(seeds), -1, np.int64)
    by_len: dict[int, list[int]] = {}
    codes_all = []
    for i, (nucl, _) in enumerate(seeds):
        codes = str_to_dna(nucl)
        codes_all.append(codes)
        by_len.setdefault(len(codes), []).append(i)
    groups = []
    for n, idxs in by_len.items():
        fw = np.stack([codes_all[i] for i in idxs])
        fwd[idxs] = dbg.lookup_edges(fw)
        rev[idxs] = dbg.lookup_edges((3 - fw)[:, ::-1])
        groups.append((np.asarray(idxs), fw))
    return fwd, rev, groups


# ---- compact chain helpers (child -> root order; packed = ne | state<<9 |
# state_no<<11, -1 past the end) ------------------------------------------

_EMIT_LUT = np.frombuffer(b"acgt-???", dtype=np.uint8)


def _chain_strings(packed: np.ndarray, reals: np.ndarray):
    """Per-row shared emission strings + offsets, vectorized.

    packed/reals: [R, C] chains in child->root order. Returns
    (full [R] bytes, ends [R, C] int32, n [R], best [R]):
      * full[r]   = all emissions of chain indices n-2 .. 0 in root->tip
                    order (delete states emit nothing, the root emits
                    nothing) — the composite contig body,
      * ends[r,i] = char offset in full[r] just PAST chain index i's
                    emission (0 for i >= n-1),
      * best[r]   = first index of the max real_score scanning tip->root
                    (getHighestScoreNode's strict-greater replacement rule
                    == argmax's first-occurrence tie-break).
    The plain contig (partialResultFromGoal, hmm_graph_search.h:83-109) is
    full[r][: ends[r, best[r]]]."""
    R, C = packed.shape
    valid = packed >= 0
    n = valid.sum(axis=1).astype(np.int64)
    rm = np.where(valid, reals, -np.inf)
    best = np.argmax(rm, axis=1)
    state = (packed >> 9) & 3
    ne = packed & 0x1FF
    chars = np.stack(
        [_EMIT_LUT[(ne >> 6) & 7], _EMIT_LUT[(ne >> 3) & 7], _EMIT_LUT[ne & 7]],
        axis=2,
    )  # [R, C, 3]
    idx = np.arange(C)[None, :]
    emits = valid & (state != 2) & (idx <= (n - 2)[:, None])
    # root -> tip order = descending chain index: work on reversed arrays
    emits_r = emits[:, ::-1]
    chars_r = chars[:, ::-1]
    el_r = np.where(emits_r, 3, 0)
    cums_r = np.cumsum(el_r, axis=1, dtype=np.int32)  # inclusive
    ends = cums_r[:, ::-1].copy()  # ends[r, i] = cums_r[r, C-1-i]
    full = [chars_r[r][emits_r[r]].tobytes() for r in range(R)]
    return full, ends, n, best


class _PathCache:
    """Host side of the cross-seed path cache (term-node equivalent).

    STITCHED per-identity links, exactly like the reference's term_nodes
    memo (hmm_graph_search.h:83-109): each entry is keyed by one PARENT
    identity (node, state, state_no) and records only the next hop — the
    child's emission, its identity, and the real-score DELTA parent->child.
    First insert wins (HashMapST semantics), so a composed path follows
    the first-inserted child at EVERY hop and can switch donors mid-chain
    — committing to one donor's whole suffix was measurably wrong (19/5720
    prod contigs picked a higher-real donor suffix where the reference's
    stitched walk lands on a different path). Resolution (suffix bytes +
    downstream real max/offset) is memoized per entry.

    The bucketized table probed by the wavefront kernel lives on device as
    [2*HB, 16] rows, direction-major (4 slots: cols 0-3 key a, 4-7 key b,
    8-11 entry index — one 64 B row gather per probe); `pending`
    accumulates (bucket, slot, a, b, val) scatter updates."""

    def __init__(self, size_log2: int = 19):
        self.HB = 1 << size_log2  # buckets of 4 slots
        self.fill = np.zeros(self.HB, np.int8)
        self.key2idx: dict[tuple[int, int], int] = {}
        self.emis: list[bytes] = []  # child's emission (b'' = delete state)
        self.dc: list[float] = []  # real(child) - real(parent)
        self.child_key: list[tuple[int, int]] = []
        self._res: dict[int, tuple[bytes, float, int]] = {}
        self.pending: list[tuple[int, int, int, int, int]] = []
        self.limit = 0  # batch-start snapshot (see begin_batch)

    def begin_batch(self):
        """Pin resolution to the entries visible to THIS batch's device
        probe table: stitched walks ignore entries harvested mid-batch
        (the reference's serial memo has no such window; our batch
        equivalent is chunk-granularity, like its parallel threads)."""
        self._res.clear()
        self.limit = len(self.emis)

    @property
    def entries(self):  # truthiness + len() compatibility
        return self.emis

    def _insert(self, a: int, b: int, entry_idx: int):
        h = ((a * 2654435761) ^ (b * 40503)) & 0xFFFFFFFF
        bk = h % self.HB
        slot = int(self.fill[bk])
        if slot >= 4:
            return  # bucket full: drop (lossy DEVICE probe; the host-side
            # key2idx stitching still sees the entry)
        self.fill[bk] = slot + 1
        self.pending.append((bk, slot, a, b, entry_idx))

    def harvest(
        self,
        nodes_row: np.ndarray,
        packed_row: np.ndarray,
        reals_row: np.ndarray,
        full: bytes,
        ends_row: np.ndarray,
        n: int,
        best: int,
    ):
        """Insert one (parent -> child) step per node of a completed goal
        path, keys = chain indices n-1 (root) .. best+1 — the reference
        walks ptr=goal..root inserting (discovered_from, ptr) pairs, so
        the goal/best node itself is never a key."""
        if n == 0 or n - 1 <= best:
            return
        ci = np.arange(n - 1, best, -1)  # parents root .. best+1
        a_arr = nodes_row[ci].tolist()
        p_par = packed_row[ci]
        b_arr = ((p_par >> 11 << 2) | ((p_par >> 9) & 3)).tolist()
        p_ch = packed_row[ci - 1]
        cb_arr = ((p_ch >> 11 << 2) | ((p_ch >> 9) & 3)).tolist()
        ca_arr = nodes_row[ci - 1].tolist()
        d_arr = (reals_row[ci - 1] - reals_row[ci]).tolist()
        s_arr = ends_row[ci].tolist()
        e_arr = ends_row[ci - 1].tolist()
        k2i = self.key2idx
        for a, b, ca, cb, dc, s0, e0 in zip(
            a_arr, b_arr, ca_arr, cb_arr, d_arr, s_arr, e_arr
        ):
            if a < 0 or (a, b) in k2i:
                continue
            idx = len(self.emis)
            k2i[(a, b)] = idx
            self.emis.append(full[s0:e0])
            self.dc.append(float(dc))
            self.child_key.append((ca, cb))
            self._insert(a, b, idx)

    def walk(self, entry_idx: int):
        """Stitched walk arrays from this entry's parent: (suffix bytes,
        per-node cumulative real delta [W], codon-length delta [W], byte
        offset past each node [W]). Memoized per hit entry; a stitched
        cycle (possible only through insert-state loops across donors) or
        an unreasonably long walk is cut at the last resolved node."""
        hit = self._res.get(entry_idx)
        if hit is not None:
            return hit
        emis_l, dc_l = [], []
        on_path: set[int] = set()
        idx: int | None = entry_idx
        while idx is not None and idx not in on_path and len(on_path) < 65536:
            on_path.add(idx)
            emis_l.append(self.emis[idx])
            dc_l.append(self.dc[idx])
            idx = self.key2idx.get(self.child_key[idx])
            if idx is not None and idx >= self.limit:
                idx = None  # harvested mid-batch: invisible to this batch
        el = np.array([len(e) for e in emis_l], np.int64)
        out = (
            b"".join(emis_l),
            np.cumsum(np.array(dc_l, np.float64)),
            np.cumsum(el // 3),
            np.cumsum(el),
        )
        self._res[entry_idx] = out
        return out

    def compose(
        self,
        reals_row: np.ndarray,
        full: bytes,
        ends_row: np.ndarray,
        n: int,
        best: int,
        entry_idx: int,
        inter_pre: float,
        len_hit: int,
    ) -> bytes | None:
        """Prefix emissions + stitched cached suffix, replaying the
        reference's endgame (hmm_graph_search.h:250-262, 279-286, 345-356):
        every walked node competes for the inter goal by real_score +
        exit_prob(length) against the seed's own pre-hit inter value
        (`inter_pre`, earlier-wins ties); the winner's chain is then
        truncated at its highest-real node (tip-most on ties). Returns
        None when the pre-hit inter goal wins — the caller falls back to
        the seed's OWN inter-goal chain, exactly as an uncached search
        would end."""
        if n == 0:
            return b""
        sfx, dv, dl, bo = self.walk(entry_idx)
        v = float(reals_row[0]) + dv  # walk nodes' real scores
        lens = np.minimum(len_hit + dl, 2999).astype(np.float64)
        x = v + 2.0 * np.log(2.0 / (lens + 2.0))
        xw = x.max()
        if inter_pre >= xw:  # pre-hit inter goal wins (ties -> earlier)
            return None
        m = int(np.argmax(x))  # first occurrence = earliest pop wins ties
        vw = v[: m + 1]
        wmax = vw.max()
        if wmax >= float(reals_row[best]):  # tie -> tip-most = the walk
            # tip-most max within the walk: LAST index at the max
            wj = len(vw) - 1 - int(np.argmax(vw[::-1]))
            return full + sfx[: bo[wj]]
        return full[: ends_row[best]]


@partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _cache_scatter(tab, d, buckets, slots, na, nb, nv):
    """Scatter new cache entries into the persistent device bucket table.

    tab: [2*HB, 16] direction-major. Out-of-range buckets (the padding)
    are dropped."""
    HB = tab.shape[0] // 2
    rows = jnp.where(buckets < HB, d * HB + buckets, 2 * HB)
    tab = tab.at[rows, slots].set(na, mode="drop")
    tab = tab.at[rows, slots + 4].set(nb, mode="drop")
    tab = tab.at[rows, slots + 8].set(nv, mode="drop")
    return tab


_RC_TABLE = bytes.maketrans(b"acgt-", b"tgca-")


def _round_up_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@partial(jax.jit, static_argnums=(3,))
def _slice_stack_f32(dnodes, dpacked, dreals, lmax: int):
    """One stacked int32 transfer for the three chain planes (the reals
    plane rides bitcast). lmax is pow2-bucketed by the caller so only a
    handful of shapes ever compile."""
    return jnp.stack(
        [
            dnodes[:, :lmax],
            dpacked[:, :lmax],
            jax.lax.bitcast_convert_type(dreals[:, :lmax], jnp.int32),
        ]
    )


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
    # ---- escalation ladder (three compiled shapes): every seed's RECORDED
    # result comes from a run that neither hit a step cap nor overflowed
    # its pool, matching the uncapped, unbounded-memory reference search.
    #   round 1 (main): full-width chunks; a chunk stops as soon as it
    #     stops being productive — when <= main_thresh rows are still
    #     active — or at the defer_steps hard cap. Survivors + overflowed
    #     seeds are deferred, everyone else is final.
    #   round 2 (deep): deferred seeds re-run at deep_chunk width with a
    #     deep_pool_mult x pool and deep_max_steps, uncapped.
    #   round 3 (exact): the rare seeds that STILL ended capped/overflowed
    #     re-run at exact_chunk width with an exact_pool_mult x pool.
    defer_steps: int = 256
    main_thresh: int = 16  # alive-row count at which a main chunk stops
    deep_chunk: int = 64
    deep_pool_mult: int = 4
    deep_max_steps: int = 4096
    exact_chunk: int = 8
    exact_pool_mult: int = 32
    exact_max_steps: int = 16384

    mesh: object = None  # jax.sharding.Mesh to shard the seed axis over
    # harvest finished partial (inter-goal) paths into the cache, matching
    # the reference's unconditional partialResultFromGoal; False restricts
    # harvesting to accepted-goal paths
    harvest_partials: bool = True
    # diagnostics: called per (seed, direction) with the traceback/compose
    # inputs when set — used by tools/ to audit cache-composition decisions
    debug_hook: object = None

    def __post_init__(self):
        import dataclasses

        if self.config.dtype is not self.dtype:
            self.config = dataclasses.replace(self.config, dtype=self.dtype)
        # main tier: arena depth = the defer cap (trace/extract shapes stay
        # small and STATIC — one compile, no per-bucket recompiles mid-run)
        P = self.config.pool_size
        self.cfg_main = self.config
        if self.defer_steps and self.defer_steps < self.config.max_steps:
            self.cfg_main = dataclasses.replace(
                self.config, max_steps=self.defer_steps
            )
        # deep/exact tiers run the XLA kernel path: the Pallas select
        # kernel's VMEM temporaries scale with the pool width, and these
        # big-pool narrow-row shapes blow the scoped-VMEM budget (the
        # tiers are also a tiny share of total steps)
        self.cfg_deep = dataclasses.replace(
            self.config,
            pool_size=P * self.deep_pool_mult,
            max_steps=max(self.config.max_steps, self.deep_max_steps),
            use_pallas=False, use_pallas_expand=False,
        )
        self.cfg_exact = dataclasses.replace(
            self.config,
            pool_size=P * self.exact_pool_mult,
            max_steps=max(self.config.max_steps, self.exact_max_steps),
            use_pallas=False, use_pallas_expand=False,
        )
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
            if self.deep_chunk % n:
                self.deep_chunk = ((self.deep_chunk + n - 1) // n) * n
            if self.exact_chunk % n:
                self.exact_chunk = ((self.exact_chunk + n - 1) // n) * n

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
        self.cache_f.begin_batch()
        self.cache_r.begin_batch()
        if self._dev_cache is None:
            self._dev_cache = jnp.full((2 * HB, 16), -1, jnp.int32)
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
        self.last_stats = {
            "expansions": 0, "steps": 0, "overflow": 0,
            "deferred": 0, "escalated": 0,
        }
        results: dict[int, str] = {}
        order = list(range(len(seeds)))
        # round 1: full-width chunks, adaptive early stop + hard cap
        deferred: list[int] = []
        for i in range(0, len(seeds), self.chunk):
            deferred.extend(
                self._run_chunk(
                    seeds, order[i : i + self.chunk], results, self.cfg_main,
                    limit=None, width=self.chunk,
                    act_thresh=self.main_thresh,
                )
            )
        self.last_stats["deferred"] = len(deferred)
        # round 1.5: re-run deferrals at the SAME config once — the first
        # chunks ran on a cold path cache and defer most of their seeds;
        # by now the cache is hot and the bulk short-circuit in a few
        # steps, leaving only true stragglers for the deep tier
        if len(deferred) > self.deep_chunk:
            again: list[int] = []
            for i in range(0, len(deferred), self.chunk):
                again.extend(
                    self._run_chunk(
                        seeds, deferred[i : i + self.chunk], results,
                        self.cfg_main, limit=None, width=self.chunk,
                        act_thresh=self.main_thresh,
                    )
                )
            deferred = again
        self.last_stats["stragglers"] = len(deferred)
        # round 2: deep re-runs, narrow width, bigger pool, uncapped
        dw = min(self.deep_chunk, self.chunk)
        escalated: list[int] = []
        for i in range(0, len(deferred), dw):
            escalated.extend(
                self._run_chunk(
                    seeds, deferred[i : i + dw], results, self.cfg_deep,
                    limit=None, width=dw,
                )
            )
        self.last_stats["escalated"] = len(escalated)
        # round 3: exact re-runs for anything still capped/overflowed
        ew = min(self.exact_chunk, dw)
        for i in range(0, len(escalated), ew):
            self._run_chunk(
                seeds, escalated[i : i + ew], results, self.cfg_exact,
                limit=None, width=ew, final=True,
            )
        return [results[i] for i in range(len(seeds))]

    def warmup(self, seeds: list[tuple[str, int]]):
        """Compile all three ladder shapes (one tiny search each) so a
        timed run pays zero compilation. Restores the cache state so the
        warmup leaves the searcher bit-identical to a fresh one."""
        cf, cr, dev = self.cache_f, self.cache_r, self._dev_cache
        if cf is not None:
            self.cache_f, self.cache_r = _PathCache(), _PathCache()
            self._dev_cache = None
        self.last_stats = {
            "expansions": 0, "steps": 0, "overflow": 0,
            "deferred": 0, "escalated": 0,
        }
        scratch: dict[int, str] = {}
        take = seeds[: min(len(seeds), 4)]
        idxs = list(range(len(take)))
        self._run_chunk(take, idxs, scratch, self.cfg_main,
                        limit=None, width=self.chunk,
                        act_thresh=self.main_thresh)
        dw = min(self.deep_chunk, self.chunk)
        self._run_chunk(take, idxs, scratch, self.cfg_deep,
                        limit=None, width=dw)
        ew = min(self.exact_chunk, dw)
        self._run_chunk(take, idxs, scratch, self.cfg_exact,
                        limit=None, width=ew, final=True)
        self.last_stats = {}
        if cf is not None:
            self.cache_f, self.cache_r, self._dev_cache = cf, cr, dev

    def _run_chunk(self, all_seeds, idxs, results, cfg, limit, width,
                   act_thresh=0, final=False):
        """Search the seeds at `idxs` under `cfg`; record contigs in
        `results`; return the indices needing escalation (still active at
        the stop condition, or pool-overflowed). `final=True` records
        everything and counts residual overflow instead of escalating."""
        contigs, still_active, overflowed = self._search_chunk(
            [all_seeds[i] for i in idxs], cfg, limit, width, act_thresh
        )
        deferred = []
        for j, i in enumerate(idxs):
            bad = still_active[j] or overflowed[j]
            if bad and not final:
                deferred.append(i)
            else:
                results[i] = contigs[j]
                if bad:
                    self.last_stats["overflow"] += 1
        return deferred

    def _build_starts(self, seeds: list[tuple[str, int]], S: int):
        si_f = np.zeros((S, 8), np.int32)
        sf_f = np.zeros((S, 3), np.float64)
        si_r = np.zeros((S, 8), np.int32)
        sf_r = np.zeros((S, 3), np.float64)
        si_f[:, 0] = -1  # padding seeds: absent node, no expansion
        si_r[:, 0] = -1
        si_f[:, 6] = -1  # padding parent: root (traceback terminator)
        si_r[:, 6] = -1
        node_f, node_r, groups = _batch_lookup(self.dbg, seeds)
        divisor = 3 if self.fwd_hmm.alphabet == PROTEIN else 1
        ss_all = np.array([ss for _, ss in seeds], np.int64)
        Lr = self.rev_hmm.model_length
        for idxs, fw in groups:
            ss = ss_all[idxs]
            ints, floats = _make_starts(
                self.fwd_hmm, fw, ss, node_f[idxs], True
            )
            si_f[idxs], sf_f[idxs] = ints, floats
            l_start = Lr - ss - fw.shape[1] // divisor
            ints, floats = _make_starts(
                self.rev_hmm, fw, l_start, node_r[idxs], False
            )
            si_r[idxs], sf_r[idxs] = ints, floats
        return si_f, sf_f, si_r, sf_r

    def _search_chunk(self, seeds, cfg=None, step_limit=None, width=None,
                      act_thresh=0):
        cfg = cfg or self.config
        S = width or self.chunk
        B = cfg.expand_width
        si_f, sf_f, si_r, sf_r = self._build_starts(seeds, S)
        limit_arr = (
            None if step_limit is None else jnp.asarray(step_limit, jnp.int32)
        )
        thresh_arr = (
            None if not act_thresh else jnp.asarray(act_thresh, jnp.int32)
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
                cfg,
                self.fwd_hmm.model_length,
                tab,
                limit_arr,
                thresh_arr,
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
                        cfg,
                        hmm_.model_length,
                        tab,
                        limit_arr,
                        thresh_arr,
                    )
                )
            rf, rr = halves
            res = {
                k: (
                    rf[k] + rr[k]
                    if k in ("expansions", "steps", "scal")
                    else jnp.concatenate(
                        [jnp.atleast_1d(rf[k]), jnp.atleast_1d(rr[k])], axis=0
                    )
                )
                for k in rf
            }

        # ---- fetch 1: the scalar triple (steps, expansions, overflow);
        # overflow is tracked per SEED from the meta block (a seed's
        # recorded run must be overflow-free; escalation re-runs it)
        scal = np.asarray(res["scal"])
        steps = int(scal[0])
        self.last_stats["steps"] += steps
        self.last_stats["expansions"] += int(scal[1])

        # ---- device traceback over the full (static) trace arena: the
        # arena is sized per ladder tier (main = defer_steps), so the
        # extract compiles ONCE per tier instead of per pow2 length bucket
        # (a mid-run bucket compile cost ~14 s on the tunneled TPU)
        Tc = res["trace3"].shape[2]
        trace3 = res["trace3"]
        treal = res["treal"]
        start_idx = jnp.where(
            res["cached_at"] >= 0, res["cached_at"], res["inter_idx"]
        )
        dnodes, dpacked, dreals, dlens = extract_chains(trace3, treal, start_idx)

        # ---- fetch 2: per-seed meta block + chain lengths
        meta = np.asarray(
            jnp.concatenate([res["meta"], dlens[:, None]], axis=1)
        )
        inter_pre = meta[:, 6].view(np.float32).astype(np.float64)
        # pow2 bucket so the slice+stack jit compiles only a few shapes
        lmax = min(Tc, _round_up_pow2(max(int(meta[:, 7].max()), 64)))

        # ---- fetch 3: the chains, one stacked transfer
        if dreals.dtype == jnp.float32:
            arr = np.asarray(_slice_stack_f32(dnodes, dpacked, dreals, lmax))
            nodes, packed = arr[0], arr[1]
            reals = arr[2].view(np.float32).astype(np.float64)
        else:  # float64 exactness mode (CPU tests)
            nodes = np.asarray(dnodes[:, :lmax])
            packed = np.asarray(dpacked[:, :lmax])
            reals = np.asarray(dreals[:, :lmax], np.float64)

        ce = meta[:, 2]
        act = meta[:, 4] != 0
        ovf = meta[:, 5] != 0
        still_active = act[:S] | act[S:]
        overflowed = ovf[:S] | ovf[S:]
        ce_f, ce_r = ce[:S], ce[S:]
        # harvest any direction whose search FINISHED (goal accepted or
        # frontier exhausted) — the reference caches the result chain after
        # every search, partial results included (partialResultFromGoal is
        # called unconditionally, hmm_graph_search.h:64-83); a direction
        # still active at a step cap is not final and must not be cached,
        # and an overflowed direction's path may have lost entries
        fin_f = ~act[:S] & ~ovf[:S]
        fin_r = ~act[S:] & ~ovf[S:]
        if not self.harvest_partials:
            goal = meta[:, 0]
            fin_f = fin_f & (goal[:S] >= 0)
            fin_r = fin_r & (goal[S:] >= 0)

        full, ends, n_arr, best = _chain_strings(packed, reals)
        plain = [
            full[r][: ends[r, best[r]]] if n_arr[r] else b""
            for r in range(packed.shape[0])
        ]

        # compose fallback data: when a hit seed's PRE-HIT inter goal beats
        # every walked node, the reference's result is the seed's own
        # inter-goal chain — extract it separately for the hit rows
        plain_i = plain
        any_hit = bool((ce >= 0).any())
        if any_hit and (meta[:, 3] >= 0).any():
            dn2, dp2, dr2, dl2 = extract_chains(
                trace3, treal, res["inter_idx"]
            )
            lmax2 = min(Tc, _round_up_pow2(max(int(np.asarray(dl2).max()), 64)))
            if dr2.dtype == jnp.float32:
                arr2 = np.asarray(_slice_stack_f32(dn2, dp2, dr2, lmax2))
                packed2 = arr2[1]
                reals2 = arr2[2].view(np.float32).astype(np.float64)
            else:
                packed2 = np.asarray(dp2[:, :lmax2])
                reals2 = np.asarray(dr2[:, :lmax2], np.float64)
            full2, ends2, n2, best2 = _chain_strings(packed2, reals2)
            plain_i = [
                full2[r][: ends2[r, best2[r]]] if n2[r] else b""
                for r in range(packed2.shape[0])
            ]
        contigs = []
        if self.debug_hook is not None:
            for i, sd in enumerate(seeds):
                for d, j, cache, ce_d in (
                    ("f", i, self.cache_f, ce_f),
                    ("r", S + i, self.cache_r, ce_r),
                ):
                    self.debug_hook(
                        seed=sd, dir=d, hit=int(ce_d[i]),
                        nodes=nodes[j], packed=packed[j], reals=reals[j],
                        full=full[j], ends=ends[j], n=int(n_arr[j]),
                        best=int(best[j]), cache=cache,
                    )
        for i, (nucl, _) in enumerate(seeds):
            start_len = len(nucl) // 3
            if self.cache_f and ce_f[i] >= 0:
                right = self.cache_f.compose(
                    reals[i], full[i], ends[i], int(n_arr[i]), int(best[i]),
                    int(ce_f[i]), float(inter_pre[i]),
                    start_len + len(full[i]) // 3,
                )
                if right is None:  # pre-hit inter goal won: own chain
                    right = plain_i[i]
            else:
                right = plain[i]
                if self.cache_f is not None and fin_f[i]:
                    self.cache_f.harvest(
                        nodes[i], packed[i], reals[i],
                        full[i], ends[i], int(n_arr[i]), int(best[i]),
                    )
            j = S + i
            if self.cache_r and ce_r[i] >= 0:
                left = self.cache_r.compose(
                    reals[j], full[j], ends[j], int(n_arr[j]), int(best[j]),
                    int(ce_r[i]), float(inter_pre[j]),
                    start_len + len(full[j]) // 3,
                )
                if left is None:
                    left = plain_i[j]
            else:
                left = plain[j]
                if self.cache_r is not None and fin_r[i]:
                    self.cache_r.harvest(
                        nodes[j], packed[j], reals[j],
                        full[j], ends[j], int(n_arr[j]), int(best[j]),
                    )
            left_rc = left.translate(_RC_TABLE)[::-1]
            contigs.append(
                left_rc.decode() + nucl.lower() + right.decode()
            )
        self.last_stats["cache_hits"] = self.last_stats.get("cache_hits", 0) + int(
            (ce_f >= 0).sum() + (ce_r >= 0).sum()
        )
        n = len(seeds)
        return contigs, still_active[:n], overflowed[:n]
