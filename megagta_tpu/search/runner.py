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
    extract_chains_windows,
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
    # one whole-batch mask-select + tobytes; per-row strings are plain
    # byte slices of the flat buffer (the per-row boolean-index loop cost
    # ~0.4 ms/row at prod scale)
    flat = chars_r[emits_r].tobytes()
    offs = np.zeros(R + 1, np.int64)
    if C:
        offs[1:] = np.cumsum(cums_r[:, -1], dtype=np.int64)
    full = [flat[offs[r] : offs[r + 1]] for r in range(R)]
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
        self.keys: list[tuple[int, int]] = []  # entry idx -> its own key
        self._res: dict[int, tuple[bytes, float, int]] = {}
        self.pending: list[tuple[int, int, int, int, int]] = []
        self.limit = 0  # batch-start snapshot (see begin_batch)
        self.synced = 0  # entries already exchanged cross-process

    def begin_batch(self):
        """Pin resolution to the entries visible to THIS batch's device
        probe table: stitched walks ignore entries harvested mid-batch
        (the reference's serial memo has no such window; our batch
        equivalent is chunk-granularity, like its parallel threads).
        Memoized walks persist across batches — each carries its ending
        identity, and a walk whose end has since gained a key is spliced
        with the extension instead of rebuilt."""
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
            self.keys.append((a, b))
            self._insert(a, b, idx)

    def _next(self, idx: int) -> int | None:
        nxt = self.key2idx.get(self.child_key[idx])
        if nxt is not None and nxt >= self.limit:
            return None  # harvested mid-batch: invisible to this batch
        return nxt

    def walk(self, entry_idx: int, depth: int = 0):
        """Stitched walk arrays from this entry's parent: (suffix bytes,
        per-node cumulative real delta [W], codon-length delta [W], byte
        offset past each node [W], ending entry idx). Memoized at every
        16th chain position with suffix sharing; a memo whose ending node
        has since gained a key (a later donor extended the region) is
        spliced with the extension. A stitched cycle (possible only
        through insert-state loops across donors) or an unreasonably long
        walk is cut at the last resolved node."""
        res = self._res
        got = res.get(entry_idx)
        if got is not None:
            nxt = self._next(got[4])
            if nxt is None or depth > 64:
                return got
            ext = self.walk(nxt, depth + 1)  # extend a stale memo
            sfx, dv, dl, bo, _ = got
            out = (
                sfx + ext[0],
                np.concatenate([dv, dv[-1] + ext[1]]),
                np.concatenate([dl, dl[-1] + ext[2]]),
                np.concatenate([bo, bo[-1] + ext[3]]),
                ext[4],
            )
            res[entry_idx] = out
            return out
        chain: list[int] = []
        on_path: set[int] = set()
        idx: int | None = entry_idx
        while (
            idx is not None
            and idx not in res
            and idx not in on_path
            and len(chain) < 65536
        ):
            chain.append(idx)
            on_path.add(idx)
            idx = self._next(idx)
        # recurse ONLY into a memoized tail: a loop exit with idx still on
        # this path (a stitched cycle through insert-state loops across
        # donors) or at the length cap must cut here — a fresh walk(idx)
        # would rebuild the same cycle forever
        tail = (
            self.walk(idx, depth + 1)
            if idx is not None and idx in res
            else None
        )
        for pos in range(len(chain) - 1, -1, -1):
            i = chain[pos]
            e, dc = self.emis[i], self.dc[i]
            el = len(e)
            if tail is None:
                cur = (
                    e, np.array([dc]), np.array([el // 3], np.int64),
                    np.array([el], np.int64), i,
                )
            else:
                sfx, dv, dl, bo, end = tail
                cur = (
                    e + sfx,
                    np.concatenate([[dc], dc + dv]),
                    np.concatenate([[el // 3], el // 3 + dl]),
                    np.concatenate([[el], el + bo]),
                    end,
                )
            if pos == 0 or (pos & 15) == 0:
                res[i] = cur
            tail = cur
        return tail

    def export_new(self):
        """(ints [n, 5] int32, dc_bits [n, 2] int32, flat emission bytes)
        of entries created since the last cross-process sync. int32/bit
        views keep the payload exact through collectives that run with
        x64 disabled (node ids < 2^31, identities 14-bit, float64 deltas
        as raw bit pairs)."""
        lo = self.synced
        n = len(self.emis) - lo
        ints = np.zeros((n, 5), np.int32)
        for j in range(n):
            i = lo + j
            ints[j, 0], ints[j, 1] = self.keys[i]
            ints[j, 2], ints[j, 3] = self.child_key[i]
            ints[j, 4] = len(self.emis[i])
        dc_bits = (
            np.asarray(self.dc[lo:], np.float64)
            .view(np.int32)
            .reshape(n, 2)
        )
        return ints, dc_bits, b"".join(self.emis[lo:])

    def merge_foreign(self, ints, dc_bits, flat):
        """Insert another process's exported entries in its creation order
        (first-insert-wins: keys already present locally are skipped)."""
        dc = np.ascontiguousarray(dc_bits).view(np.float64).ravel()
        off = 0
        k2i = self.key2idx
        for j in range(len(ints)):
            a, b, ca, cb, el = (int(x) for x in ints[j])
            e = bytes(flat[off : off + el])
            off += el
            if (a, b) in k2i:
                continue
            idx = len(self.emis)
            k2i[(a, b)] = idx
            self.emis.append(e)
            self.dc.append(float(dc[j]))
            self.child_key.append((ca, cb))
            self.keys.append((a, b))
            self._insert(a, b, idx)

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
        sfx, dv, dl, bo, _ = self.walk(entry_idx)
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


@partial(jax.jit, donate_argnums=(0,))
def _cache_scatter(tab, upd):
    """Scatter new cache entries into the persistent device bucket table.

    tab: [2*HB, 16] direction-major; upd: [N, 5] int32 rows of
    (direction-major row, slot, key a, key b, entry idx) riding ONE
    host->device transfer (each transfer pays ~100 ms of tunnel latency).
    Out-of-range rows (the padding) are dropped."""
    rows, slots = upd[:, 0], upd[:, 1]
    tab = tab.at[rows, slots].set(upd[:, 2], mode="drop")
    tab = tab.at[rows, slots + 4].set(upd[:, 3], mode="drop")
    tab = tab.at[rows, slots + 8].set(upd[:, 4], mode="drop")
    return tab


_RC_TABLE = bytes.maketrans(b"acgt-", b"tgca-")


def _round_up_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


# two-tier transfer knobs (module-level so tests can force the rare
# n_long > NLONG full-fetch fallback deterministically)
_TIER_SHORT = 64


def _tier_nlong(S: int) -> int:
    """Long-row slots in the two-tier chain transfer (S = seeds/chunk)."""
    return min(max(64, (2 * S) // 4), 2 * S)


def _refill_win(cfg) -> int:
    """Residence-window width for refill-mode extraction: an item's trace
    records span at most (item_cap + 2) * B positions from its recorded
    window start (it is selected for <= item_cap steps, B slots each)."""
    return _round_up_pow2((cfg.item_cap + 2) * cfg.expand_width)


@jax.jit
def _pack_meta(meta, dlens, scal):
    """[2S, 7] meta + chain lengths + the scalar triple in ONE downloadable
    block ([2S+1, 8] int32): every separate device->host fetch pays the
    tunnel's ~100 ms round trip."""
    m = jnp.concatenate([meta, dlens[:, None]], axis=1)
    srow = jnp.zeros((1, m.shape[1]), jnp.int32).at[0, :3].set(scal)
    return jnp.concatenate([m, srow], axis=0)


@partial(jax.jit, static_argnums=(5,))
def _pack_meta_long(meta, dlens, scal, li, n_long, NLONG: int):
    """_pack_meta + the long-row index list and its true count (scal col 3)
    appended as extra rows — still ONE transfer."""
    m = jnp.concatenate([meta, dlens[:, None]], axis=1)
    srow = (
        jnp.zeros((1, m.shape[1]), jnp.int32)
        .at[0, :3].set(scal)
        .at[0, 3].set(n_long)
    )
    pad = (-NLONG) % 8
    lrows = jnp.pad(li.astype(jnp.int32), (0, pad)).reshape(-1, 8)
    return jnp.concatenate([m, srow, lrows], axis=0)


@partial(jax.jit, static_argnums=(4, 5, 6))
def _two_tier_f32(dnodes, dpacked, dreals, dlens, SHORT: int, NLONG: int,
                  lcap: int):
    """Two-tier chain transfer: a SHORT-wide slice of every row plus the
    full lcap-wide rows of the NLONG longest chains (by device top_k).
    Measured on the prod bench: p50 chain length is 1 and only ~15% of
    rows exceed 64, while the tunnel moves ~31 MB/s — the uniform
    full-width download dominated the whole search wall. Returns
    (short [3, R, SHORT], long [3, NLONG, lcap], li [NLONG],
    n_long = rows with dlen > SHORT; if n_long > NLONG the caller must
    fall back to a full-width fetch)."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    short = jnp.stack(
        [dnodes[:, :SHORT], dpacked[:, :SHORT], bc(dreals[:, :SHORT])]
    )
    _, li = jax.lax.top_k(dlens, NLONG)
    li = li.astype(jnp.int32)
    n_long = (dlens > SHORT).sum(dtype=jnp.int32)
    long = jnp.stack(
        [
            dnodes[li][:, :lcap],
            dpacked[li][:, :lcap],
            bc(dreals[li][:, :lcap]),
        ]
    )
    return short, long, li, n_long


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
    # seed refill (continuous batching): > 0 runs the MAIN tier with this
    # many resident lockstep rows streaming the 2*chunk item queue —
    # finished rows load the next queued item mid-run instead of idling
    # (wavefront.py refill mode; the batch analogue of the reference's
    # omp schedule(dynamic,1), search.cpp:184-188). Items get defer_steps
    # residence steps each, so ladder semantics are unchanged. 0 = legacy
    # one-row-per-item chunks. Unsupported combined with `mesh`.
    refill_rows: int = 0
    first_round_cap: int | None = None  # optional round-1 step cap
    # (measured HARMFUL on the prod workload: punting early starves the
    # path cache and the convergence rounds churn 4x the steps)
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
        if self.mesh is not None:
            self.refill_rows = 0  # refill + sharded seed axis unsupported
        self.cfg_main = self.config
        if self.refill_rows > 0:
            # refill main tier: R resident rows stream the 2*chunk item
            # queue; each item gets defer_steps residence steps (the same
            # per-item budget as a legacy deferral chunk). max_steps bounds
            # the CHUNK: every item running to its cap serialized over R
            # rows, plus the drain tail.
            Qc = 2 * self.chunk
            R = min(self.refill_rows, Qc)
            R = max(R - R % 16, 16)  # Pallas row tiles + (S*B) % 8
            cap = self.defer_steps or self.config.max_steps
            # chunk bound: every item at its full residence cap, serialized
            # over the guaranteed-busy rows (R minus the idle-break window)
            steps_cap = (Qc * cap) // max(R - R // 8, 1) + cap + 8
            self.cfg_main = dataclasses.replace(
                self.config, rows=R, item_cap=cap, max_steps=steps_cap
            )
        elif self.defer_steps and self.defer_steps < self.config.max_steps:
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
            rows=0, item_cap=0,  # escalation tiers run legacy layout
        )
        self.cfg_exact = dataclasses.replace(
            self.config,
            pool_size=P * self.exact_pool_mult,
            max_steps=max(self.config.max_steps, self.exact_max_steps),
            use_pallas=False, use_pallas_expand=False,
            rows=0, item_cap=0,
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
        self._starts_cache: dict = {}
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
        """Persistent device table, updated by scattering both directions'
        pending entries in ONE padded upload."""
        HB = self.cache_f.HB
        self.cache_f.begin_batch()
        self.cache_r.begin_batch()
        if self._dev_cache is None:
            self._dev_cache = jnp.full((2 * HB, 16), -1, jnp.int32)
        n = len(self.cache_f.pending) + len(self.cache_r.pending)
        if not n:
            return self._dev_cache
        # ONE constant upload shape: a fresh pow2 pad per batch would
        # compile a new _cache_scatter executable mid-run (~0.5 s each on
        # the tunneled TPU); oversized batches loop in fixed slices.
        # 8k rows (160 KB) covers a typical chunk's harvest (~250 entries,
        # cold chunks ~2k) — the old 64k pad shipped 1.3 MB per chunk
        # (~0.6 s of tunnel time per prod run)
        PAD = 1 << 13
        upd = np.full((((n - 1) // PAD + 1) * PAD, 5), 2 * HB, np.int64)
        row = 0
        for d, cache in ((0, self.cache_f), (1, self.cache_r)):
            if cache.pending:
                arr = np.asarray(cache.pending, np.int64)
                m = len(arr)
                upd[row : row + m, 0] = d * HB + arr[:, 0]
                upd[row : row + m, 1] = arr[:, 1] % 4
                upd[row : row + m, 2:5] = arr[:, 2:5]
                row += m
                cache.pending = []
        for s in range(0, len(upd), PAD):
            self._dev_cache = _cache_scatter(
                self._dev_cache, jnp.asarray(upd[s : s + PAD], jnp.int32)
            )
        return self._dev_cache

    def sync_caches(self):
        """Cross-process path-cache exchange (multihost EP scaling).

        The reference's term-node memo is SHARED MEMORY across its OpenMP
        threads (search.cpp:184-188); per-host seed slices would otherwise
        each pay the full cold-cache exploration, which is the dominant
        multihost scaling loss. Entries created since the last sync are
        allgathered and merged in process order (first-insert-wins per
        host). COLLECTIVE: every process must call this the same number of
        times — use fixed phase barriers, e.g. search_phased()."""
        import jax

        if self.cache_f is None or jax.process_count() <= 1:
            return
        import jax.numpy as jnp
        from jax.experimental import multihost_utils as mh

        me = jax.process_index()
        nproc = jax.process_count()
        exp = [c.export_new() for c in (self.cache_f, self.cache_r)]
        sizes = np.array(
            [[len(e[0]), len(e[2])] for e in exp], np.int32
        ).ravel()
        all_sizes = np.asarray(
            mh.process_allgather(jnp.asarray(sizes))
        ).reshape(nproc, 4)
        mi = all_sizes[:, (0, 2)].max(0)
        mb = np.maximum(all_sizes[:, (1, 3)].max(0), 1)
        payload = []
        for ci, (ints, dcb, flat) in enumerate(exp):
            ip = np.zeros((int(mi[ci]), 5), np.int32)
            ip[: len(ints)] = ints
            dp = np.zeros((int(mi[ci]), 2), np.int32)
            dp[: len(dcb)] = dcb
            fp = np.zeros(int(mb[ci]), np.uint8)
            fp[: len(flat)] = np.frombuffer(flat, np.uint8)
            payload += [jnp.asarray(ip), jnp.asarray(dp), jnp.asarray(fp)]
        gath = [np.asarray(g) for g in mh.process_allgather(tuple(payload))]
        for ci, cache in enumerate((self.cache_f, self.cache_r)):
            gi, gd, gf = gath[3 * ci], gath[3 * ci + 1], gath[3 * ci + 2]
            for p in range(nproc):
                if p == me:
                    continue
                n_e, n_b = all_sizes[p, 2 * ci], all_sizes[p, 2 * ci + 1]
                cache.merge_foreign(
                    gi[p, :n_e], gd[p, :n_e], gf[p, :n_b].tobytes()
                )
            cache.synced = len(cache.emis)

    def search_phased(self, seeds, phases: int = 4) -> list[str]:
        """Multihost search with cross-process cache syncs at fixed phase
        boundaries (each process calls the same number of collectives
        regardless of its slice's convergence behavior)."""
        out: list[str] = []
        stats: dict = {}
        bounds = [len(seeds) * i // phases for i in range(phases + 1)]
        for f in range(phases):
            out.extend(self.search(seeds[bounds[f] : bounds[f + 1]]))
            for k, v in self.last_stats.items():
                if isinstance(v, (int, float)):
                    stats[k] = stats.get(k, 0) + v
            if f < phases - 1:
                self.sync_caches()
        self.last_stats = stats
        return out

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
        # round 1: full-width chunks, adaptive early stop. The cold
        # chunks' deep exploration and pool overflows look wasteful but
        # their harvests ARE the cache warm-up: both a deep-tier warm
        # round and a tight round-1 step cap were measured far slower.
        deferred = self._run_round(
            seeds, order, results, self.cfg_main, self.chunk,
            act_thresh=self.main_thresh, limit=self.first_round_cap,
        )
        self.last_stats["deferred"] = len(deferred)
        # rounds 1.5+: re-run deferrals at the SAME config while progress
        # holds — early chunks ran on a colder path cache and defer most
        # of their seeds; each pass the cache is hotter and the bulk
        # short-circuit in a few steps, leaving true stragglers for the
        # deep tier. Idle-row lockstep steps are the dominant waste, so
        # stopping chunks early and re-running survivors beats running
        # every chunk to quiescence.
        passes = 0
        while len(deferred) > self.deep_chunk and passes < 4:
            nxt = self._run_round(
                seeds, deferred, results, self.cfg_main, self.chunk,
                act_thresh=self.main_thresh,
            )
            passes += 1
            if len(nxt) > 0.7 * len(deferred):
                deferred = nxt
                break  # no longer converging: escalate the rest
            deferred = nxt
        self.last_stats["stragglers"] = len(deferred)
        # round 2: deep re-runs, narrow width, bigger pool, uncapped
        dw = min(self.deep_chunk, self.chunk)
        escalated = self._run_round(
            seeds, deferred, results, self.cfg_deep, dw
        )
        self.last_stats["escalated"] = len(escalated)
        # round 3: exact re-runs for anything still capped/overflowed
        ew = min(self.exact_chunk, dw)
        self._run_round(
            seeds, escalated, results, self.cfg_exact, ew, final=True
        )
        return [results[i] for i in range(len(seeds))]

    def _run_round(self, seeds, idx_list, results, cfg, width,
                   act_thresh=0, final=False, limit=None):
        """One escalation round, PIPELINED: chunk i+1's device run is
        dispatched before chunk i's results are downloaded, hiding the
        tunnel's transfer latency and the host-side compose/harvest under
        device compute. Chunk i+1 therefore probes the cache state from
        chunk i-1 — a one-chunk lag the reference's parallel threads have
        too, and results stay reference-exact either way (a missed hit
        just means the seed completes its own search)."""
        import time as _time

        deferred: list[int] = []
        prev = None
        walls = self.last_stats.setdefault("walls", {})
        key = f"P{cfg.pool_size}_R{cfg.rows or 0}"
        t0 = _time.perf_counter()
        td = tf = 0.0
        for i in range(0, len(idx_list), width):
            idxs = idx_list[i : i + width]
            ta = _time.perf_counter()
            cur = (
                idxs,
                self._dispatch_chunk(
                    [seeds[j] for j in idxs], cfg, limit, width, act_thresh
                ),
            )
            td += _time.perf_counter() - ta
            if prev is not None:
                ta = _time.perf_counter()
                out = self._finish_chunk(prev[1])
                tf += _time.perf_counter() - ta
                deferred.extend(self._record(prev[0], out, results, final))
            prev = cur
        if prev is not None:
            ta = _time.perf_counter()
            out = self._finish_chunk(prev[1])
            tf += _time.perf_counter() - ta
            deferred.extend(self._record(prev[0], out, results, final))
        w = walls.setdefault(
            key, {"wall": 0.0, "dispatch": 0.0, "finish": 0.0, "chunks": 0}
        )
        w["wall"] += round(_time.perf_counter() - t0, 3)
        w["dispatch"] += round(td, 3)
        w["finish"] += round(tf, 3)
        w["chunks"] += (len(idx_list) + width - 1) // width
        return deferred

    def _record(self, idxs, out, results, final):
        contigs, still_active, overflowed = out
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
        """Unpipelined single chunk (warmup): search, record, return the
        indices needing escalation."""
        out = self._search_chunk(
            [all_seeds[i] for i in idxs], cfg, limit, width, act_thresh
        )
        return self._record(idxs, out, results, final)

    def _build_starts(self, seeds: list[tuple[str, int]], S: int):
        si_f = np.zeros((S, 8), np.int32)
        sf_f = np.zeros((S, 3), np.float64)
        si_r = np.zeros((S, 8), np.int32)
        sf_r = np.zeros((S, 3), np.float64)
        si_f[:, 0] = -1  # padding seeds: absent node, no expansion
        si_r[:, 0] = -1
        si_f[:, 6] = -1  # padding parent: root (traceback terminator)
        si_r[:, 6] = -1
        # escalation re-runs re-search the same seeds; memoize the host
        # edge lookups + start scoring per seed (one dict hit per re-run)
        sc = self._starts_cache
        missing = [i for i, s in enumerate(seeds) if s not in sc]
        for i, s in enumerate(seeds):
            if s in sc:
                si_f[i], sf_f[i], si_r[i], sf_r[i] = sc[s]
        if not missing:
            return si_f, sf_f, si_r, sf_r
        sub = [seeds[i] for i in missing]
        node_f, node_r, groups = _batch_lookup(self.dbg, sub)
        divisor = 3 if self.fwd_hmm.alphabet == PROTEIN else 1
        ss_all = np.array([ss for _, ss in sub], np.int64)
        Lr = self.rev_hmm.model_length
        midx = np.asarray(missing)
        for idxs, fw in groups:
            ss = ss_all[idxs]
            ints, floats = _make_starts(
                self.fwd_hmm, fw, ss, node_f[idxs], True
            )
            si_f[midx[idxs]], sf_f[midx[idxs]] = ints, floats
            l_start = Lr - ss - fw.shape[1] // divisor
            ints, floats = _make_starts(
                self.rev_hmm, fw, l_start, node_r[idxs], False
            )
            si_r[midx[idxs]], sf_r[midx[idxs]] = ints, floats
        for i in missing:
            sc[seeds[i]] = (
                si_f[i].copy(), sf_f[i].copy(),
                si_r[i].copy(), sf_r[i].copy(),
            )
        return si_f, sf_f, si_r, sf_r

    def _search_chunk(self, seeds, cfg=None, step_limit=None, width=None,
                      act_thresh=0):
        """Dispatch + finish in one call (warmup and tests; the search
        rounds pipeline the two halves across chunks)."""
        return self._finish_chunk(
            self._dispatch_chunk(seeds, cfg, step_limit, width, act_thresh)
        )

    def _dispatch_chunk(self, seeds, cfg=None, step_limit=None, width=None,
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
        # batch-visibility snapshot: the pipelined round dispatches chunk
        # i+1 (advancing cache limits) before chunk i composes, so the
        # dispatch-time window rides the ctx and is restored at finish —
        # compose/walk must stitch only through entries this chunk's
        # device table could have probed
        limits = (
            (self.cache_f.limit, self.cache_r.limit) if self.cache_f else None
        )
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

        # ---- device traceback over the full (static) trace arena: the
        # arena is sized per ladder tier (main = defer_steps), so the
        # extract compiles ONCE per tier instead of per pow2 length bucket
        # (a mid-run bucket compile cost ~14 s on the tunneled TPU)
        start_idx = jnp.where(
            res["cached_at"] >= 0, res["cached_at"], res["inter_idx"]
        )
        if "row_of" in res:
            # refill mode: items share rows over time; gather each item's
            # residence window from its row and extract per item
            WIN = _refill_win(cfg)
            dnodes, dpacked, dreals, dlens = extract_chains_windows(
                res["trace3"], res["treal"], res["row_of"], res["tstart"],
                start_idx, WIN,
            )
            # a chain holds at most one node per residence step; the caps
            # are exact (one compile per ladder tier — no pow2 bucketing
            # needed, and pow2 rounding doubled the transfer bytes)
            lcap = min(WIN, cfg.item_cap + 2)
        else:
            dnodes, dpacked, dreals, dlens = extract_chains(
                res["trace3"], res["treal"], start_idx
            )
            lcap = min(res["trace3"].shape[2], cfg.max_steps + 2)
        lcap = min(lcap, dnodes.shape[1])
        ctx = {
            "seeds": seeds, "S": S, "res": res, "cfg": cfg, "lcap": lcap,
            "chains": (dnodes, dpacked, dreals),
            "meta_dev": _pack_meta(res["meta"], dlens, res["scal"]),
            "limits": limits,
        }
        if dreals.dtype == jnp.float32:
            # chain length <= steps + 1 (per ITEM under refill), so the
            # transfer slices are STATIC — they run at dispatch time and
            # the downloads overlap the next chunk's device compute
            # instead of waiting on a meta round trip
            SHORT = _TIER_SHORT
            NLONG = _tier_nlong(S)
            if lcap <= 2 * SHORT:
                ctx["arr_dev"] = _slice_stack_f32(
                    dnodes, dpacked, dreals, lcap
                )
            else:
                short, long_, li, n_long = _two_tier_f32(
                    dnodes, dpacked, dreals, dlens, SHORT, NLONG, lcap
                )
                ctx["short_dev"] = short
                ctx["long_dev"] = long_
                ctx["tier"] = (SHORT, NLONG)
                ctx["meta_dev"] = _pack_meta_long(
                    res["meta"], dlens, res["scal"], li, n_long, NLONG
                )
        return ctx

    def _finish_chunk(self, ctx):
        seeds = ctx["seeds"]
        S = ctx["S"]
        res = ctx["res"]
        if ctx.get("limits") is not None:
            # restore this chunk's dispatch-time cache window (limits only
            # grow, so memoized walks stay monotonically extendable)
            self.cache_f.limit, self.cache_r.limit = ctx["limits"]
        dnodes, dpacked, dreals = ctx["chains"]
        trace3, treal = res["trace3"], res["treal"]
        Tc = trace3.shape[2]

        # ---- the single download round: meta block (+ chain lengths +
        # scalars) and the pre-sliced chain planes together
        import time as _time

        _t0 = _time.perf_counter()
        if "short_dev" in ctx:
            # two-tier transfer: SHORT cols of every row + full rows of
            # the NLONG longest chains; rare overload (> NLONG long rows,
            # the cold first chunks) falls back to one full-width fetch
            SHORT, NLONG = ctx["tier"]
            lcap = ctx["lcap"]
            mblk, a_s, a_l = jax.device_get(
                (ctx["meta_dev"], ctx["short_dev"], ctx["long_dev"])
            )
            R = a_s.shape[1]
            meta, scal = mblk[:R], mblk[R]
            li = mblk[R + 1 :].reshape(-1)[:NLONG]
            n_long = int(scal[3])
            if n_long > NLONG:
                arr = np.asarray(
                    _slice_stack_f32(dnodes, dpacked, dreals, lcap)
                )
                nodes, packed = arr[0], arr[1]
                reals = arr[2].view(np.float32).astype(np.float64)
            else:
                nodes = np.full((R, lcap), -1, np.int32)
                packed = np.full((R, lcap), -1, np.int32)
                reals_i = np.zeros((R, lcap), np.int32)
                nodes[:, :SHORT] = a_s[0]
                packed[:, :SHORT] = a_s[1]
                reals_i[:, :SHORT] = a_s[2]
                nodes[li] = a_l[0]
                packed[li] = a_l[1]
                reals_i[li] = a_l[2]
                reals = reals_i.view(np.float32).astype(np.float64)
        elif "arr_dev" in ctx:
            mblk, arr = jax.device_get((ctx["meta_dev"], ctx["arr_dev"]))
            nodes, packed = arr[0], arr[1]
            reals = arr[2].view(np.float32).astype(np.float64)
            meta, scal = mblk[:-1], mblk[-1]
        else:  # float64 exactness mode (CPU tests)
            mblk = np.asarray(ctx["meta_dev"])
            meta, scal = mblk[:-1], mblk[-1]
            lmax = min(Tc, _round_up_pow2(max(int(meta[:, 7].max()), 64)))
            nodes = np.asarray(dnodes[:, :lmax])
            packed = np.asarray(dpacked[:, :lmax])
            reals = np.asarray(dreals[:, :lmax], np.float64)
        self.last_stats["steps"] += int(scal[0])
        self.last_stats["expansions"] += int(scal[1])
        self.last_stats["t_get"] = (
            self.last_stats.get("t_get", 0.0) + _time.perf_counter() - _t0
        )
        _t1 = _time.perf_counter()
        inter_pre = meta[:, 6].view(np.float32).astype(np.float64)

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

        def inter_chain_contigs():
            """When a hit seed's PRE-HIT inter goal beats every walked
            node, the reference's result is the seed's own inter-goal
            chain — extracted LAZILY (the fallback fires rarely; the
            extra traceback + transfer would otherwise tax every chunk)."""
            if "row_of" in res:
                dn2, dp2, dr2, dl2 = extract_chains_windows(
                    trace3, treal, res["row_of"], res["tstart"],
                    res["inter_idx"], _refill_win(ctx["cfg"]),
                )
                cap2 = dn2.shape[1]
            else:
                dn2, dp2, dr2, dl2 = extract_chains(
                    trace3, treal, res["inter_idx"]
                )
                cap2 = Tc
            # reuse the dispatch path's STATIC slice width: a fresh
            # pow2(dlens.max()) bucket here compiled a new executable the
            # one time per run the fallback fires (~0.6 s on the tunnel)
            lmax2 = min(cap2, ctx["lcap"])
            if dr2.dtype == jnp.float32:
                arr2 = np.asarray(_slice_stack_f32(dn2, dp2, dr2, lmax2))
                packed2 = arr2[1]
                reals2 = arr2[2].view(np.float32).astype(np.float64)
            else:
                packed2 = np.asarray(dp2[:, :lmax2])
                reals2 = np.asarray(dr2[:, :lmax2], np.float64)
            full2, ends2, n2, best2 = _chain_strings(packed2, reals2)
            return [
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
        sides: list = [None] * (2 * S)
        fallback_rows: list[int] = []
        for i, (nucl, _) in enumerate(seeds):
            start_len = len(nucl) // 3
            for cache, ce_d, fin_d, j in (
                (self.cache_f, ce_f, fin_f, i),
                (self.cache_r, ce_r, fin_r, S + i),
            ):
                if cache and ce_d[i] >= 0:
                    side = cache.compose(
                        reals[j], full[j], ends[j], int(n_arr[j]),
                        int(best[j]), int(ce_d[i]), float(inter_pre[j]),
                        start_len + len(full[j]) // 3,
                    )
                    if side is None:  # pre-hit inter goal won: own chain
                        fallback_rows.append(j)
                else:
                    side = plain[j]
                    if cache is not None and fin_d[i]:
                        cache.harvest(
                            nodes[j], packed[j], reals[j],
                            full[j], ends[j], int(n_arr[j]), int(best[j]),
                        )
                sides[j] = side
        if fallback_rows:
            plain_i = inter_chain_contigs()
            for j in fallback_rows:
                sides[j] = plain_i[j]
        for i, (nucl, _) in enumerate(seeds):
            left_rc = sides[S + i].translate(_RC_TABLE)[::-1]
            contigs.append(
                left_rc.decode() + nucl.lower() + sides[i].decode()
            )
        self.last_stats["cache_hits"] = self.last_stats.get("cache_hits", 0) + int(
            (ce_f >= 0).sum() + (ce_r >= 0).sum()
        )
        self.last_stats["t_host"] = (
            self.last_stats.get("t_host", 0.0) + _time.perf_counter() - _t1
        )
        n = len(seeds)
        return contigs, still_active[:n], overflowed[:n]
