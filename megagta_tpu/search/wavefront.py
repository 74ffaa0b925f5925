"""Batched TPU wavefront search: many seeds' A* searches advanced in lockstep.

This is the TPU-native replacement for the reference's per-seed serial A*
with an OpenMP loop over seeds (src/search.cpp:184-188). Design:

  * The parallel axes are SEEDS x FRONTIER WIDTH: S searches run in lockstep
    inside one jitted lax.while_loop, each expanding the top-B frontier
    nodes per step (SURVEY.md section 7: wavefront batched DP). All graph
    navigation is gathers into the SdBG's precomputed succ/invalid/
    is_multi1 arrays — the 3-hop 64-codon walk of node_enumerator.h:98-128
    becomes three [S*B, 4^h] gathers (or one hop-table row gather).
  * Exact-semantics pool: the serial algorithm's open_hash dedup
    (hmm_graph_search.h:294-331) only avoids pushing dominated duplicates;
    pushing everything and killing all entries matching expanded identities
    yields the IDENTICAL expansion sequence. The pool is append-only with
    masked kills, plus compaction when full.
  * Goal acceptance stays exact for every B: a goal node is accepted only
    when it is the lexicographic maximum of the whole pool — precisely the
    serial "goal popped first" condition (a_star_node.h:34-83 ordering:
    max fval, then min state_no, then state m > d > i).
  * Traceback: every expanded node appends one record to a trace arena
    (parent index, packed codon emission, state, real_score);
    contigs are reconstructed from the goal/inter-goal chain on device
    (extract_chains; partialResultFromGoal, hmm_graph_search.h:83-109).

Memory layout (v2 — the per-step cost is HBM traffic, so the pool is laid
out so each step touches only what it must):

  * The pool is SEPARATE per-field [S, P] arrays, not an interleaved
    [S, P, F] block: `fval` (selection priority; INT_MIN = dead/empty slot),
    `ia` (node id), `ibx` (packed state|state_no|neg_count|codon),
    `lpx` (packed parent+1|length), and three score arrays. Selection reads
    only fval(+ibx for tie-breaks); the kill-by-identity compare reads
    ia/ibx and rewrites fval; the other arrays are touched only by B-row
    gathers and CAND-column appends. The v1 interleaved layout made every
    step read the whole pool several times (~26 ms/step at production
    shapes); v2 steps are ~1 ms.
  * Selection is hierarchical and EXACT: per-128 block maxima, then the
    lexicographic (fval, state_no, state) max resolved within candidate
    blocks. Top-B frontier selection gathers the top-B blocks by max and
    takes an exact top_k inside them (any global top-B entry lives in a
    block whose max is >= the B-th best value, and at most B-1 blocks can
    have a larger max, so the top-B blocks contain all top-B entries).
  * Compaction (squeeze alive entries front, evict worst on overflow) runs
    UNCONDITIONALLY in an outer loop each time the inner step loop fills
    the pool — no lax.cond on big state inside the hot loop.

With expand_width B == 1 the expansion sequence equals the serial oracle's
exactly (tested bit-for-bit in float64). B > 1 explores a superset per step
(the reference's own semantics do not define an order among equal-priority
pops); the acceptance rule above keeps results equal in practice and ~B x
faster.

Other differences vs the serial oracle (documented, tested):
  * pool overflow evicts worst-priority entries (reported via a flag)
  * candidate compression (cand_cap) keeps the top-cap candidates per step
    via approx_max_k; any drop of a VALID candidate is detected and flagged
    via `overflow` (kept-valid count < min(valid count, cap)). Note the
    compression key is float32: fvals beyond 2^24 may be mis-ordered AT the
    cap boundary (kept-vs-dropped swap among near-tied candidates); the
    count check cannot see a swap, only a shortfall. Exact mode is
    cand_cap=0.
  * float32 scores on TPU (float64 under JAX x64 for exactness tests)

Packed-field layout (asserted in wavefront_search_merged):
  ibx: bits 0-1 state (0=m 1=i 2=d), 2-13 state_no (model len <= 4094),
       14-19 neg_count (saturating at 63; prune_len <= 62),
       20-28 packed codon emission
  lpx: bits 0-19 parent trace index + 1 (0 = root), 20-30 length
       (saturating at 2047 — beyond that length only feeds the
       exit-probability length cap of 2999, cf. hmm_graph_search.h:48-51)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CODON_TABLE_FLAT, RC_CODON_TABLE_FLAT, AA_STOP
from ..graph.sdbg import SdBG
from ..hmm.profile import DD, DM, IM, II, MD, MI, MM, ProfileHMM

SCALE = 10000.0
HWEIGHT = 2.0
NEG = -1e30
INT_MIN32 = -(2**31)
INT_MAX32 = 2**31 - 1

IDENT_MASK = (1 << 14) - 1  # state | state_no<<2
NE_SHIFT = 20
NEG_SHIFT = 14
LEN_SHIFT = 20
PARENT_MASK = (1 << 20) - 1

__all__ = [
    "DeviceGraph",
    "DeviceHMM",
    "WavefrontConfig",
    "wavefront_search_merged",
    "extract_chains",
    "extract_chains_windows",
]


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceGraph:
    """Graph tables for the search kernel.

    Two layouts (the search stage never mutates `invalid` — the reference
    loads the final graph read-only, src/search.cpp:98 — so the whole 3-hop
    codon expansion of node_enumerator.h:98-128 is structurally static):

    * path tables (default): `pt [size+1, W, 2]` = the VALID codon paths
      per source row, compacted left (stable, so the candidate order equals
      the raw 64-slot order restricted to valid slots — index tie-breaks
      are preserved). W = the graph's max valid-path count rounded up to a
      power of two (typically 4-16 vs the dense 64: a dBG node has out-
      degree ~1, so nearly all of the 4^3 codon slots are dead weight in
      both the row gather and the pool append). word 0 = target row;
      word 1 = aa_fwd | aa_rev<<5 | packed_codon<<10 | valid<<19 | low<<20.
    * raw tables (memory fallback for graphs too big for 8W B/edge):
      `succ [size+1, 4]`, `invalid`, `is_multi1`, walked 3 levels deep in
      the kernel (dense 64-wide candidates).
    """

    succ: jnp.ndarray | None  # [size+1, 4] int32 (row `size` = sentinel)
    invalid: jnp.ndarray | None  # [size+1] bool
    is_multi1: jnp.ndarray | None  # [size+1] bool
    pt: jnp.ndarray | None = None  # [size+1, W, 2] int32

    def tree_flatten(self):
        return (self.succ, self.invalid, self.is_multi1, self.pt), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_rows(self) -> int:
        arr = self.pt if self.pt is not None else self.succ
        return arr.shape[0]

    @property
    def W(self) -> int:
        """Codon paths per row (64 in raw mode)."""
        return self.pt.shape[1] if self.pt is not None else 64

    # beyond this many rows the path tables (~128 B/row) are skipped in
    # favor of the raw-table kernel path (keeps HBM for the pool arenas)
    HOP_TABLE_MAX_ROWS = 48_000_000
    # byte budget for the pt plane itself: W is graph-dependent (pow2 of
    # the max valid-path count over ALL rows), so a single branchy row can
    # push W to 64 and the auto path must re-check rows*W*8 after the
    # host-side path walk, falling back to raw tables when it would not
    # leave HBM room for the pool/trace arenas
    HOP_TABLE_MAX_BYTES = 6 << 30

    @staticmethod
    def from_sdbg(dbg: SdBG, precompute_hops: bool | None = None) -> "DeviceGraph":
        size = dbg.size
        succ = np.full((size + 1, 4), size, np.int32)
        ok = dbg.succ >= 0
        succ[:size][ok] = dbg.succ[ok]
        succ[:size][~ok] = size
        invalid = np.append(dbg.invalid, True)
        multi1 = np.append(dbg.is_multi1, True)
        if precompute_hops is None:
            precompute_hops = size + 1 <= DeviceGraph.HOP_TABLE_MAX_ROWS
        if not precompute_hops:
            return DeviceGraph(
                succ=jnp.asarray(succ),
                invalid=jnp.asarray(invalid),
                is_multi1=jnp.asarray(multi1),
            )
        l1 = succ  # [size+1, 4]
        l2 = succ[l1].reshape(size + 1, 16)
        l3 = succ[l2].reshape(size + 1, 64)
        v = (
            ~invalid[np.repeat(l1, 16, axis=1)]
            & ~invalid[np.repeat(l2, 4, axis=1)]
            & ~invalid[l3]
            & ~invalid[:, None]
        )
        low = (
            multi1[np.repeat(l1, 16, axis=1)]
            & multi1[np.repeat(l2, 4, axis=1)]
            & multi1[l3]
        )
        # stable left-compaction of valid slots: candidate (hence pool
        # append) order stays the raw slot order among alive entries
        maxw = max(1, int(v.sum(1).max()))
        W = 1 << (maxw - 1).bit_length()
        order = np.argsort(~v, axis=1, kind="stable")[:, :W]
        tgt = np.take_along_axis(l3, order, 1).astype(np.int32)
        vv = np.take_along_axis(v, order, 1)
        lowv = np.take_along_axis(low, order, 1)
        c = order.astype(np.int32)
        c1, c2, c3 = c >> 4, (c >> 2) & 3, c & 3
        ne = (c1 << 6) | (c2 << 3) | c3
        aa_f = CODON_TABLE_FLAT.astype(np.int32)[c]
        aa_r = RC_CODON_TABLE_FLAT.astype(np.int32)[c]
        w1 = (
            aa_f
            | (aa_r << 5)
            | (ne << 10)
            | (vv.astype(np.int32) << 19)
            | (lowv.astype(np.int32) << 20)
        ).astype(np.int32)
        pt = np.stack([tgt, w1], axis=-1)
        return DeviceGraph(
            succ=None, invalid=None, is_multi1=None, pt=jnp.asarray(pt)
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceHMM:
    msc: jnp.ndarray  # [L+1, 22] (cols 20/21 = -inf)
    isc: jnp.ndarray  # [L+1, 22]
    trans: jnp.ndarray  # [L+1, 7]
    mme: jnp.ndarray  # [L+1]
    h: jnp.ndarray  # [3, L+1] heuristic (m, i, d)
    # fused per-state scoring row, indexed by dir*(L+1) + min(state_no, L):
    # cols 0-21 msc[next], 22-43 isc[next], 44-50 trans[cur], 51 mme[next],
    # 52 h_m[next], 53 h_i[cur], 54 h_d[next] (next = min(cur+1, L)).
    # One row per expanded node replaces seven scattered table gathers; the
    # kernel fetches it with an exact one-hot matmul (a 0/1 x value product
    # has a single nonzero term per output, so even the TPU's bf16x3 f32
    # dot reproduces the stored float bit-for-bit).
    hsuper: jnp.ndarray | None = None  # [2*(L+1), 64]

    def tree_flatten(self):
        return (
            self.msc, self.isc, self.trans, self.mme, self.h, self.hsuper,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def L(self) -> int:
        return self.msc.shape[0] - 1

    @staticmethod
    def stack(a: "DeviceHMM", b: "DeviceHMM") -> "DeviceHMM":
        """Direction-stacked tables [2, ...] for the merged fwd+rev run."""
        st = lambda x, y: jnp.stack([x, y])  # noqa: E731

        def super_rows(dev: "DeviceHMM"):
            L = dev.L
            cur = jnp.arange(L + 1)
            nxt = jnp.minimum(cur + 1, L)
            out = jnp.zeros((L + 1, 64), dev.msc.dtype)
            out = out.at[:, 0:22].set(dev.msc[nxt])
            out = out.at[:, 22:44].set(dev.isc[nxt])
            out = out.at[:, 44:51].set(dev.trans[cur])
            out = out.at[:, 51].set(dev.mme[nxt])
            out = out.at[:, 52].set(dev.h[0, nxt])
            out = out.at[:, 53].set(dev.h[1, cur])
            out = out.at[:, 54].set(dev.h[2, nxt])
            return out

        return DeviceHMM(
            msc=st(a.msc, b.msc),
            isc=st(a.isc, b.isc),
            trans=st(a.trans, b.trans),
            mme=st(a.mme, b.mme),
            h=st(a.h, b.h),
            hsuper=jnp.concatenate([super_rows(a), super_rows(b)], axis=0),
        )

    @staticmethod
    def from_profile(hmm: ProfileHMM, heuristic: np.ndarray, dtype=jnp.float32):
        L = hmm.model_length
        A = hmm.alphabet_length
        msc = np.full((L + 1, 22), NEG)
        msc[:, :A] = np.where(np.isfinite(hmm.msc), hmm.msc, NEG)
        isc = np.full((L + 1, 22), NEG)
        isc[:, :A] = np.where(np.isfinite(hmm.isc), hmm.isc, NEG)
        trans = np.where(np.isfinite(hmm.trans), hmm.trans, NEG)
        mme = np.where(np.isfinite(hmm.mme), hmm.mme, 0.0)  # mme[0] unused
        h = np.where(np.isfinite(heuristic), heuristic, NEG)
        return DeviceHMM(
            msc=jnp.asarray(msc, dtype),
            isc=jnp.asarray(isc, dtype),
            trans=jnp.asarray(trans, dtype),
            mme=jnp.asarray(mme, dtype),
            h=jnp.asarray(h, dtype),
        )


@dataclass(frozen=True)
class WavefrontConfig:
    pool_size: int = 1 << 12
    max_steps: int = 1 << 11
    prune_len: int = 20
    low_cov_penalty: float = 0.5
    expand_width: int = 1  # B: frontier nodes expanded per seed per step
    # B>1 only: keep the top-cand_cap candidates by fval of the B*(2W+1)
    # produced per step (0 = keep all). Typical valid counts are ~5 per
    # expansion (dBG out-degree ~1), so a cap of ~12*B is lossless in
    # practice while making the pool grow ~10x slower (fewer compact
    # sorts); any dropped VALID candidate is flagged via `overflow`.
    cand_cap: int = 0
    use_cache: bool = False  # cross-seed path-cache short-circuit (turbo)
    use_pallas: bool = False  # fused Pallas select+extract+kill kernel
    # fused Pallas expansion kernel (step_expand); separate switch: its
    # combined compile with the select kernel is very slow on some runtimes
    use_pallas_expand: bool = False
    # None = auto (hop tables unless the graph exceeds the HBM threshold);
    # False forces the raw 3-gather kernel path
    precompute_hops: bool | None = None
    # ---- seed refill (continuous batching): rows > 0 runs the lockstep
    # loop over `rows` RESIDENT rows instead of one row per (seed,
    # direction) item. When a row's item finishes (goal accepted, cache
    # hit, frontier exhausted, or `item_cap` steps of residence), its
    # result registers are flushed to a per-item output table and the next
    # queued item is loaded into the row — the batch analogue of the
    # reference's `omp schedule(dynamic,1)` over seeds (search.cpp:184-188),
    # which never idles a thread. rows == 0 keeps the legacy one-row-per-
    # item layout (bit-compatible with the serial-oracle tests).
    rows: int = 0
    item_cap: int = 0  # per-item step budget under refill (0 = max_steps);
    # items that exceed it are flushed as deferred, exactly like a legacy
    # chunk hitting its max_steps — the runner's escalation ladder re-runs
    # them at the deep/exact tiers
    dtype: object = jnp.float32


# start_ints field indices ([S, 8] int32 rows built by the runner) and trace
# float fields — kept from v1 for interface stability
NI_NODE, NI_STATE_NO, NI_STATE, NI_FVAL, NI_NEG, NI_LEN, NI_PARENT, NI_NE = range(8)
NF_SCORE, NF_REAL, NF_MAX = range(3)


def _exit_prob(length, dtype):
    l = jnp.minimum(length, 2999).astype(dtype)
    return 2.0 * jnp.log(2.0 / (l + 2.0))


def build_aa64(forward: bool) -> np.ndarray:
    return (CODON_TABLE_FLAT if forward else RC_CODON_TABLE_FLAT).astype(np.int32)


def _to_fval(x):
    # (int) cast clamped like the reference's x86 behavior (node_enumerator
    # .h:173): out-of-range -> INT_MIN. v2 stores INT_MIN as "dead slot", so
    # the clamp floor is INT_MIN+2 (same relative order; ties among clamped
    # values were already unspecified in the reference's heap).
    ok = (x > INT_MIN32) & (x < INT_MAX32)
    return jnp.where(ok, x.astype(jnp.int32), INT_MIN32 + 2)


def _rank(state):
    # priority rank m=3 > d=2 > i=1 (a_star_node.h:70-80)
    return jnp.where(state == 0, 3, jnp.where(state == 2, 2, 1))


def _k2(ibx):
    """Tie-break key: min state_no, then state m > d > i."""
    sno = (ibx >> 2) & 0xFFF
    return ((4095 - sno) << 2) | _rank(ibx & 3)


@jax.jit
def extract_chains(trace3, treal, start_idx):
    """Compact child->root chains from the trace arenas, on device.

    The v1 design walked parent pointers with one take_along_axis per step;
    TPU lowers per-row gathers to serial dynamic-slices, so at production
    shapes the walk cost ~2.3 s per bench run. v2 exploits that parent
    indices strictly DECREASE along a chain: one backward sweep over trace
    columns (a lax.scan of pure elementwise [S]-vector ops — no gathers)
    marks every on-chain position, then a single multi-operand lax.sort
    compacts the marked entries to the row fronts in child->root (descending
    trace-position) order. ~27 ms at [1024, 1024] vs 47 ms for the walk
    capped at 512 steps — and the sweep has no cap to retry.

    Returns (nodes, packed, reals [S, T], lengths [S]): packed =
    ne | state << 9 | state_no << 11, -1 marks past-end slots. Chain entry
    0 is `start_idx` itself; the last valid entry is the root (trace parent
    -1, cf. runner traceback of hmm_graph_search.h:83-109). Callers slice
    columns to lengths.max() before any host transfer.
    """
    S, _, T = trace3.shape
    parentT = jnp.transpose(trace3[:, 2])  # [T, S]
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    def step(w, x):
        pcol, t = x
        hit = w == t
        # self-referencing records (zero-filled padding) terminate
        nxt = jnp.where(hit, jnp.where(pcol == t, -1, pcol), w)
        return nxt, hit

    # unroll 64: the scan body is a couple of fused [S]-wide selects, so
    # per-iteration cost is TPU loop overhead (~0.2 ms measured); at
    # T=4097 the unroll-8 sweep cost ~110 ms per chunk on the prod bench
    _, hitsT = jax.lax.scan(step, start_idx, (parentT[::-1], ts), unroll=64)
    on = jnp.transpose(hitsT)[:, ::-1]  # [S, T], trace-position ascending
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    key = jnp.where(on, -tt, INT_MAX32)
    k, nodes, packed, reals = jax.lax.sort(
        (key, trace3[:, 0], trace3[:, 1], treal),
        dimension=1, num_keys=1, is_stable=True,
    )
    valid = k != INT_MAX32
    return (
        jnp.where(valid, nodes, -1),
        jnp.where(valid, packed, -1),
        jnp.where(valid, reals, 0.0),
        valid.sum(axis=1, dtype=jnp.int32),
    )


@partial(jax.jit, static_argnames=("WIN",))
def extract_chains_windows(trace3, treal, rows, tstart, start_idx, WIN: int):
    """Per-ITEM chain extraction for refill-mode runs.

    Under refill, several items share one row's trace arena over time; item
    q's records live in row rows[q] inside its residence window
    [tstart[q], tstart[q] + WIN) (WIN = (item_cap + 2) * B covers the
    longest possible residence). One vmapped dynamic_slice gathers each
    item's window, then the same backward parent sweep + stable sort as
    extract_chains runs on [Q, WIN] — parent pointers stay ABSOLUTE trace
    positions, so the sweep compares against t0 + column. start_idx < 0
    (never-dequeued items) yields an empty chain."""
    S, _, T = trace3.shape
    t0 = jnp.clip(tstart, 0, max(T - WIN, 0))
    rr = jnp.clip(rows, 0, S - 1)

    def one(r, t):
        z = jnp.zeros((), r.dtype)
        i3 = jax.lax.dynamic_slice(trace3, (r, z, t), (1, 3, WIN))[0]
        f1 = jax.lax.dynamic_slice(treal, (r, t), (1, WIN))[0]
        return i3, f1

    sub3, subf = jax.vmap(one)(rr, t0)  # [Q, 3, WIN], [Q, WIN]
    parentT = jnp.transpose(sub3[:, 2])  # [WIN, Q]
    js = jnp.arange(WIN - 1, -1, -1, dtype=jnp.int32)

    def step(w, x):
        pcol, j = x
        t_abs = t0 + j
        hit = w == t_abs
        nxt = jnp.where(hit, jnp.where(pcol == t_abs, -1, pcol), w)
        return nxt, hit

    _, hitsT = jax.lax.scan(step, start_idx, (parentT[::-1], js), unroll=64)
    on = jnp.transpose(hitsT)[:, ::-1]  # [Q, WIN], window-position ascending
    jj = jnp.arange(WIN, dtype=jnp.int32)[None, :]
    key = jnp.where(on, -jj, INT_MAX32)
    k, nodes, packed, reals = jax.lax.sort(
        (key, sub3[:, 0], sub3[:, 1], subf),
        dimension=1, num_keys=1, is_stable=True,
    )
    valid = k != INT_MAX32
    return (
        jnp.where(valid, nodes, -1),
        jnp.where(valid, packed, -1),
        jnp.where(valid, reals, 0.0),
        valid.sum(axis=1, dtype=jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("config", "model_length"),
)
def wavefront_search_merged(
    graph: DeviceGraph,
    hmm: DeviceHMM,  # direction-stacked tables [2, ...] (DeviceHMM.stack)
    dirs: jnp.ndarray,  # [Q] int32: 0 = forward HMM, 1 = reverse HMM
    start_ints: jnp.ndarray,  # [Q, 8] int32 initial nodes
    start_floats: jnp.ndarray,  # [Q, 3] dtype
    config: WavefrontConfig,
    model_length: int,
    cache_tab: jnp.ndarray | None = None,  # [2*HB, 16] bucketized cache
    step_limit: jnp.ndarray | None = None,  # [] int32 dynamic cap (straggler
    # deferral: the runner reruns still-active seeds later; arenas/compile
    # stay sized by the static config.max_steps)
    act_thresh: jnp.ndarray | None = None,  # [] int32: stop the lockstep
    # loop once <= this many ROWS are still active (the survivors are
    # deferred by the runner; 0/None = run until none are active). Under
    # refill the queue must also be drained: the loop continues while
    # items remain to dequeue.
):
    """Run Q lockstep searches. Returns dict of results + trace arenas.

    Two scheduling modes (config.rows):
      * legacy (rows == 0): one resident row per (seed, direction) item —
        the loop runs until the act_thresh stopping rule, idling rows
        whose searches finished early.
      * seed refill (0 < rows < Q): `rows` resident rows stream the item
        queue; a finished row's result registers are scattered to a
        per-item output table and the next queued item is loaded into the
        row in the same step (pool row cleared, new start appended as an
        extra candidate-block column). This is the batch analogue of the
        reference's `omp schedule(dynamic,1)` over seeds
        (src/search.cpp:184-188): no row ever idles while work remains.
        Per-item semantics are identical — each item sees exactly the
        same per-row pool/selection/expansion mechanics, and items that
        exceed config.item_cap residence steps are flushed as deferred
        (the ladder re-runs them), matching a legacy chunk's max_steps.

    Data-movement design: every step appends a full CAND-slot block at the
    SAME offset for all seeds (invalid slots are stored dead), and traces
    the B selected nodes at slot 1 + step*B. All pool writes are therefore
    dynamic_update_slice with scalar offsets plus one full-width masked
    fval rewrite (the identity kill) — no scatters in the loop (refill
    adds ONE masked [rows, 16] scatter of finished items' registers).
    """
    Q = start_ints.shape[0]  # (seed, direction) items
    REFILL = 0 < config.rows < Q
    S = config.rows if REFILL else Q  # resident lockstep rows
    P = config.pool_size
    B = config.expand_width
    dt = config.dtype
    L = model_length
    W = graph.W  # codon paths per row (64 raw, small in path-table mode)
    CW = 2 * W + 1  # match paths + insert paths + delete
    CAND0 = B * CW
    CAND = (
        min(config.cand_cap, CAND0)
        if (B > 1 and config.cand_cap > 0)
        else CAND0
    )
    T = config.max_steps * B + 1
    BL = 128
    NB = P // BL
    item_cap = config.item_cap or config.max_steps
    IDLE_MAX = max(S // 8, 1)  # refill: inner loop breaks once this many
    # rows sit idle while queue items remain (flush/refill run in the
    # OUTER loop so the hot body carries zero refill overhead)

    assert P % BL == 0 and CAND + 1 < P, (P, CAND)
    assert B <= NB, "expand_width must be <= pool_size/128"
    assert L <= 4094, "model_length exceeds the 12-bit state_no packing"
    assert config.prune_len <= 62, "prune_len exceeds the 6-bit neg packing"
    assert T <= PARENT_MASK, "max_steps*B exceeds the 20-bit parent packing"

    aa64_2 = jnp.stack(
        [jnp.asarray(build_aa64(True)), jnp.asarray(build_aa64(False))]
    )  # [2, 64] aa codes per direction
    low_cov_pen = jnp.asarray(-math.log(config.low_cov_penalty), dt)

    # candidate slot labels: slots 0..63 match, 64..127 insert, 128 delete
    c1 = jnp.arange(64, dtype=jnp.int32) // 16
    c2 = (jnp.arange(64, dtype=jnp.int32) // 4) % 4
    c3 = jnp.arange(64, dtype=jnp.int32) % 4
    ne64 = (c1 << 6) | (c2 << 3) | c3

    def pack_ibx(state, state_no, neg, ne):
        return (
            state
            | (state_no << 2)
            | (jnp.minimum(neg, 63) << NEG_SHIFT)
            | (ne << NE_SHIFT)
        )

    def pack_lpx(parent, length):
        return (parent + 1) | (jnp.minimum(length, 2047) << LEN_SHIFT)

    # ---- pool state: seven SEPARATE [S, P] planes — fval (INT_MIN =
    # dead/empty slot), ia (node id), ibx (packed state|state_no|neg|codon),
    # lpx (packed parent+1|length), and three score planes (see module
    # docstring for why the planes are separate).
    fval = jnp.full((S, P), INT_MIN32, jnp.int32)
    pia = jnp.zeros((S, P), jnp.int32)
    pibx = jnp.zeros((S, P), jnp.int32)
    plpx = jnp.zeros((S, P), jnp.int32)
    psc = jnp.zeros((S, P), dt)
    pre = jnp.zeros((S, P), dt)
    pmx = jnp.zeros((S, P), dt)

    # initial residents: items 0..S-1 (legacy: every item)
    ri = start_ints[:S]
    rf = start_floats[:S]
    s_node = ri[:, NI_NODE]
    s_sno = ri[:, NI_STATE_NO]
    s_state = ri[:, NI_STATE]
    s_ibx = pack_ibx(s_state, s_sno, ri[:, NI_NEG], ri[:, NI_NE])
    s_lpx = pack_lpx(ri[:, NI_PARENT], ri[:, NI_LEN])
    has_start = s_node >= 0
    fval = fval.at[:, 0].set(
        jnp.where(has_start, jnp.maximum(ri[:, NI_FVAL], INT_MIN32 + 2),
                  INT_MIN32)
    )
    pia = pia.at[:, 0].set(s_node)
    pibx = pibx.at[:, 0].set(s_ibx)
    plpx = plpx.at[:, 0].set(s_lpx)
    psc = psc.at[:, 0].set(rf[:, NF_SCORE])
    pre = pre.at[:, 0].set(rf[:, NF_REAL])
    pmx = pmx.at[:, 0].set(rf[:, NF_MAX])

    # ---- trace arenas (one record per selected node per step):
    # trace3 [S, 3, T] = (node, packed ne|state|state_no, parent), treal
    trace3 = jnp.zeros((S, 3, T), jnp.int32)
    treal = jnp.zeros((S, T), dt)

    carry = {
        "fval": fval, "pia": pia, "pibx": pibx, "plpx": plpx,
        "psc": psc, "pre": pre, "pmx": pmx,
        "trace3": trace3, "treal": treal,
        "trace_len": jnp.zeros((S,), jnp.int32),
        "active": jnp.ones((S,), bool),
        "dirs": dirs[:S].astype(jnp.int32),
        "done_partial": jnp.zeros((S,), bool),
        "goal_idx": jnp.full((S,), -1, jnp.int32),
        "inter_idx": jnp.zeros((S,), jnp.int32),
        "inter_val": jnp.full((S,), NEG, dt),
        "overflow": jnp.zeros((S,), bool),
        "expansions": jnp.zeros((), jnp.int32),
        "cached_entry": jnp.full((S,), -1, jnp.int32),
        "cached_at": jnp.full((S,), -1, jnp.int32),
        "next_free": jnp.ones((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }
    if REFILL:
        negbits = int(np.float32(NEG).view(np.int32))
        init_row = np.zeros(16, np.int32)
        init_row[[0, 1, 2, 3]] = -1  # goal, inter, cached_entry, cached_at
        init_row[4] = 1  # active/deferred until flushed
        init_row[6] = negbits  # inter_val f32 bits
        carry.update(
            r_item=jnp.arange(S, dtype=jnp.int32),
            r_steps=jnp.zeros((S,), jnp.int32),
            r_tstart=jnp.ones((S,), jnp.int32),  # first step's tpos
            head=jnp.asarray(S, jnp.int32),
            outm=jnp.broadcast_to(jnp.asarray(init_row), (Q, 16)),
        )
        # refill mode inits inter to "nothing yet": the start node sets it
        # when selected+traced (strict > then matches the reference's
        # start-initialized inter exactly; see runner traceback notes)
        carry["inter_val"] = jnp.full((S,), NEG, dt)
        carry["inter_idx"] = jnp.full((S,), -1, jnp.int32)
    else:
        # legacy: record the start as trace slot 0 (immediate-goal seeds'
        # whole chain; also the initial inter goal)
        start_is_goal = s_sno >= L
        trace3 = carry["trace3"].at[:, 0, 0].set(s_node)
        trace3 = trace3.at[:, 1, 0].set(
            ri[:, NI_NE] | (s_state << 9) | (s_sno << 11)
        )
        trace3 = trace3.at[:, 2, 0].set(ri[:, NI_PARENT])
        carry["trace3"] = trace3
        carry["treal"] = carry["treal"].at[:, 0].set(rf[:, NF_REAL])
        carry["trace_len"] = jnp.where(start_is_goal, 1, carry["trace_len"])
        carry["goal_idx"] = jnp.where(start_is_goal, 0, carry["goal_idx"])
        carry["active"] = carry["active"] & ~start_is_goal
        # the start node is also the initial inter goal (reference inits
        # inter_goal_ptr = &starting_node)
        carry["inter_val"] = jnp.where(
            carry["active"],
            rf[:, NF_REAL] + _exit_prob(ri[:, NI_LEN], dt),
            carry["inter_val"],
        )

    if cache_tab is None:
        cache_tab = jnp.full((2 * 8, 16), -1, jnp.int32)
    max_steps_d = jnp.asarray(config.max_steps, jnp.int32)
    if step_limit is not None:
        max_steps_d = jnp.minimum(max_steps_d, step_limit.astype(jnp.int32))
    act_thresh_d = (
        jnp.zeros((), jnp.int32)
        if act_thresh is None
        else act_thresh.astype(jnp.int32)
    )
    item_cap_d = jnp.asarray(item_cap, jnp.int32)

    def select_lex(fval, ibx, active):
        """Exact lexicographic (fval, -state_no, state-rank) argmax; ties ->
        lowest index (heap order in the reference is unspecified for full
        ties). Hierarchical: block maxima first, so only fval+ibx are read."""
        fvm = jnp.where(active[:, None], fval, INT_MIN32)
        blk = fvm.reshape(S, NB, BL)
        k2b = _k2(ibx).reshape(S, NB, BL)
        m1 = blk.max(-1)  # [S, NB]
        best1 = m1.max(-1, keepdims=True)  # [S, 1]
        k2m = jnp.where(blk == best1[..., None], k2b, INT_MIN32)
        m2 = k2m.max(-1)  # [S, NB]
        best2 = m2.max(-1, keepdims=True)
        elig = (m1 == best1) & (m2 == best2)
        bidx = jnp.argmax(elig, axis=-1)  # first eligible block
        fblk = jnp.take_along_axis(blk, bidx[:, None, None], axis=1)[:, 0]
        kblk = jnp.take_along_axis(k2b, bidx[:, None, None], axis=1)[:, 0]
        # best2 entries within a best1 block: both conditions
        hit = (fblk == best1) & (kblk == best2)
        off = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        sel1 = bidx.astype(jnp.int32) * BL + off
        any_alive = best1[:, 0] > INT_MIN32
        return sel1, any_alive

    def select_topB(fval, ibx, active):
        """Exact top-B frontier by fval among non-goal entries. Any global
        top-B entry lives in a block whose max >= the B-th best value, and
        <= B-1 blocks can beat that value, so the top-B blocks (by max)
        contain all top-B entries. Within the gathered blocks an iterative
        argmax replaces lax.top_k (which lowers to a full sort at this
        width on TPU) and the block-offset lookup is a B-way select (an
        elementwise gather would cost ~0.5 ms)."""
        sno = (ibx >> 2) & 0xFFF
        nk1 = jnp.where(active[:, None] & (sno < L), fval, INT_MIN32)
        nb = nk1.reshape(S, NB, BL)
        bm = nb.max(-1)  # [S, NB]
        _, bsel = jax.lax.top_k(bm, B)  # [S, B] (small width NB)
        bsel = bsel.astype(jnp.int32)
        cand = jnp.take_along_axis(nb, bsel[..., None], axis=1).reshape(S, B * BL)
        lane = jnp.arange(B * BL, dtype=jnp.int32)[None, :]
        sels, vals = [], []
        cur = cand
        for _ in range(B):
            vals.append(cur.max(-1))
            i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
            sels.append(i)
            cur = jnp.where(lane == i[:, None], INT_MIN32, cur)
        ci = jnp.stack(sels, -1)  # [S, B]
        topv = jnp.stack(vals, -1)
        div = ci // BL
        blkof = jnp.zeros_like(ci)
        for b in range(B):
            blkof = jnp.where(div == b, bsel[:, b : b + 1], blkof)
        sel = blkof * BL + (ci % BL)
        return sel, topv

    def expand(node, state, state_no, neg, length, score, real, mx,
               parent_idx, ndir, skip_prune):
        """All 2W+1 successor candidates per input node (node_enumerator
        .h:65). inputs [N] -> packed candidate fields [N, 2W+1] + valid.
        N = S * B. Per node this costs ONE graph-row gather + ONE fused
        scoring-row fetch (hsuper one-hot matmul); everything else is
        fused elementwise math. skip_prune [N]: the node is a START (its
        expansion is unpruned, hmm_graph_search.h:217-234) — under refill
        starts appear at arbitrary steps, so the flag is per node.
        """
        N = node.shape[0]
        next_state = jnp.minimum(state_no + 1, L)
        cur_state = jnp.minimum(state_no, L)

        # fused scoring row (exact one-hot matmul; see DeviceHMM.hsuper)
        comb = ndir * (L + 1) + cur_state  # [N]
        onehot = (
            comb[:, None] == jnp.arange(2 * (L + 1), dtype=jnp.int32)[None, :]
        ).astype(dt)
        hrow = onehot @ hmm.hsuper  # [N, 64]
        t = hrow[:, 44:51]
        mme = hrow[:, 51]
        h_m, h_i, h_d = hrow[:, 52], hrow[:, 53], hrow[:, 54]

        match_tr = jnp.select(
            [state == 0, state == 1, state == 2],
            [t[:, MM], t[:, IM], t[:, DM]],
        )
        ins_tr = jnp.select(
            [state == 0, state == 1, state == 2],
            [t[:, MI], t[:, II], jnp.full_like(t[:, MI], NEG)],
        )
        del_tr = jnp.select(
            [state == 0, state == 1, state == 2],
            [t[:, MD], jnp.full_like(t[:, MD], NEG), t[:, DD]],
        )

        # codon paths: one row gather (path tables) or the raw 3-hop walk
        safe_node = jnp.clip(node, 0, graph.num_rows - 1)
        if graph.pt is not None:
            row = graph.pt[safe_node]  # [N, W, 2]
            tgt = row[..., 0]
            w1 = row[..., 1]
            v3 = (((w1 >> 19) & 1) != 0) & (node >= 0)[:, None]
            low_cov = jnp.where(
                ((w1 >> 20) & 1) != 0, low_cov_pen, jnp.asarray(0.0, dt)
            )
            aa = jnp.where((ndir == 0)[:, None], w1 & 31, (w1 >> 5) & 31)
            ne_p = (w1 >> 10) & 0x1FF
        else:
            l1 = graph.succ[safe_node]  # [N, 4]
            v1 = ~graph.invalid[l1]
            l2 = graph.succ[l1].reshape(N, 16)
            v2 = ~graph.invalid[l2] & jnp.repeat(v1, 4, axis=1)
            tgt = graph.succ[l2].reshape(N, 64)
            v3 = ~graph.invalid[tgt] & jnp.repeat(v2, 4, axis=1)
            v3 = v3 & (node >= 0)[:, None] & ~graph.invalid[safe_node][:, None]

            m1 = graph.is_multi1[jnp.repeat(l1, 16, axis=1)]
            m2 = graph.is_multi1[jnp.repeat(l2, 4, axis=1)]
            m3 = graph.is_multi1[tgt]
            low_cov = jnp.where(m1 & m2 & m3, low_cov_pen, 0.0)
            aa = jnp.where(
                (ndir == 0)[:, None], aa64_2[0][None, :], aa64_2[1][None, :]
            )
            ne_p = jnp.broadcast_to(ne64[None, :], (N, 64))
        not_stop = aa != AA_STOP

        # per-path emissions: 22-way fused select from the scoring row (an
        # elementwise [N, W] gather would serialize on TPU)
        msc = jnp.zeros((N, W), dt)
        isc = jnp.zeros((N, W), dt)
        for a_ in range(22):
            hit = aa == a_
            msc = jnp.where(hit, hrow[:, a_][:, None], msc)
            isc = jnp.where(hit, hrow[:, 22 + a_][:, None], isc)

        score = score[:, None]
        real = real[:, None]
        mx = mx[:, None]

        # ---- match candidates (slots 0..W-1)
        m_real = real + match_tr[:, None] + msc - low_cov
        m_improved = m_real >= mx
        m_max = jnp.where(m_improved, m_real, mx)
        m_neg = jnp.where(m_improved, 0, neg[:, None] + 1)
        m_score = score + match_tr[:, None] + msc - low_cov - mme[:, None]
        m_fval = _to_fval(SCALE * (m_score + HWEIGHT * h_m[:, None]))
        m_valid = v3 & not_stop

        # ---- insert candidates (slots W..2W-1); forbidden from 'd'
        i_real = real + ins_tr[:, None] + isc - low_cov
        i_score = score + ins_tr[:, None] + isc - low_cov
        i_fval = _to_fval(SCALE * (i_score + HWEIGHT * h_i[:, None]))
        i_valid = m_valid & (state != 2)[:, None]

        # ---- delete candidate (slot 2W); forbidden from 'i'
        d_real = real[:, 0] + del_tr
        d_score = score[:, 0] + del_tr - mme
        d_fval = _to_fval(SCALE * (d_score + HWEIGHT * h_d))
        d_valid = (state != 1) & (node >= 0)

        cand_node = jnp.concatenate([tgt, tgt, safe_node[:, None]], axis=1)
        nxt_b = jnp.broadcast_to(next_state[:, None], (N, W))
        sno_b = jnp.broadcast_to(state_no[:, None], (N, W))
        cand_state_no = jnp.concatenate([nxt_b, sno_b, next_state[:, None]], axis=1)
        cand_state = jnp.concatenate(
            [
                jnp.zeros((N, W), jnp.int32),
                jnp.ones((N, W), jnp.int32),
                jnp.full((N, 1), 2, jnp.int32),
            ],
            axis=1,
        )
        cand_fval = jnp.concatenate([m_fval, i_fval, d_fval[:, None]], axis=1)
        cand_neg = jnp.concatenate(
            [
                m_neg,
                neg[:, None] + jnp.ones((N, W), jnp.int32),
                neg[:, None] + 1,
            ],
            axis=1,
        )
        cand_len = jnp.concatenate(
            [
                jnp.broadcast_to((length + 1)[:, None], (N, 2 * W)),
                length[:, None],
            ],
            axis=1,
        )
        cand_ne = jnp.concatenate(
            [ne_p, ne_p, jnp.full((N, 1), (4 << 6) | (4 << 3) | 4, jnp.int32)],
            axis=1,
        )
        cand_score = jnp.concatenate([m_score, i_score, d_score[:, None]], axis=1)
        cand_real = jnp.concatenate([m_real, i_real, d_real[:, None]], axis=1)
        cand_max = jnp.concatenate(
            [m_max, jnp.broadcast_to(mx, (N, W)), mx], axis=1
        )
        valid = jnp.concatenate([m_valid, i_valid, d_valid[:, None]], axis=1)

        # pruning (hmm_graph_search.h:292-310); start-node expansions are
        # pushed unpruned in the reference (hmm_graph_search.h:217-234)
        if config.prune_len > 0:
            keep = ((cand_len < 5) | (cand_neg <= config.prune_len)) & (
                cand_real > 0.0
            )
            valid = valid & (keep | skip_prune[:, None])

        c_ibx = pack_ibx(cand_state, cand_state_no, cand_neg, cand_ne)
        c_lpx = pack_lpx(
            jnp.broadcast_to(parent_idx[:, None], (N, CW)), cand_len
        )
        return cand_fval, cand_node, c_ibx, c_lpx, cand_score, cand_real, cand_max, valid

    def probe_cache(ids_a, ids_b, dirs_r):
        """4-slot bucket lookup of identities; -1 on miss.

        The cross-seed path cache is the deterministic counterpart of the
        reference's term-node memo (hmm_graph_search.h:211-234): a hit means
        a previous seed's best path already passes through this (node,
        state, state_no); the search short-circuits and the host composes
        prefix + cached suffix. Buckets hold 4 slots in one 64-byte row
        (cols 0-3 key a, 4-7 key b, 8-11 host entry index) so the probe is
        ONE row gather instead of twelve elementwise ones.
        """
        # the table arrives pre-flattened [2*HB, 16]: an in-loop reshape
        # once cost a 64 MB relayout copy PER STEP (~0.1 ms/step profiled)
        HB = cache_tab.shape[0] // 2
        ua = ids_a.astype(jnp.uint32)
        ub = ids_b.astype(jnp.uint32)
        h = (ua * jnp.uint32(2654435761) ^ (ub * jnp.uint32(40503))).astype(
            jnp.uint32
        )
        idx = (h % jnp.uint32(HB)).astype(jnp.int32)
        row = cache_tab[dirs_r * HB + idx]
        val = jnp.full(ids_a.shape, -1, jnp.int32)
        for s in range(4):
            hit = (row[:, s] == ids_a) & (row[:, 4 + s] == ids_b)
            val = jnp.where((val < 0) & hit, row[:, 8 + s], val)
        return val

    def pack_regs(c, act_col):
        """[S, 16] register block for the per-item output scatter: cols
        0-6 mirror the legacy meta layout (goal, inter_idx, cached_entry,
        cached_at, active/deferred, overflow, inter_val f32 bits), col 7 =
        row, col 8 = residence-window start."""
        iv = jax.lax.bitcast_convert_type(
            c["inter_val"].astype(jnp.float32), jnp.int32
        )
        pk = jnp.stack(
            [
                c["goal_idx"], c["inter_idx"], c["cached_entry"],
                c["cached_at"], act_col,
                c["overflow"].astype(jnp.int32), iv,
                jnp.arange(S, dtype=jnp.int32), c["r_tstart"],
            ],
            axis=1,
        )
        return jnp.pad(pk, ((0, 0), (0, 7)))

    def compact(c):
        """Squeeze alive entries (best fval first) to the row fronts.

        The payload rides through one multi-operand lax.sort — TPU sorts
        beat permute-by-gather here (elementwise row gathers of the pool
        are ~100x slower than the sort itself). Entries beyond the append
        headroom are evicted worst-first (rare; flagged per seed via
        `overflow`)."""
        key = jnp.where(c["fval"] > INT_MIN32, -c["fval"], INT_MAX32)
        key, pia, pibx, plpx, psc, pre, pmx = jax.lax.sort(
            (key, c["pia"], c["pibx"], c["plpx"], c["psc"], c["pre"], c["pmx"]),
            dimension=1, num_keys=1, is_stable=True,
        )
        alive_s = key != INT_MAX32
        counts = alive_s.sum(axis=-1).astype(jnp.int32)
        overflow = c["overflow"] | (counts > P - CAND - 1)
        keep = jnp.arange(P, dtype=jnp.int32)[None, :] < P - CAND - 1
        fval = jnp.where(alive_s & keep, -key, INT_MIN32)
        next_free = jnp.minimum(jnp.max(counts), P - CAND - 1)
        return dict(
            c, fval=fval, pia=pia, pibx=pibx, plpx=plpx, psc=psc, pre=pre,
            pmx=pmx, overflow=overflow, next_free=next_free,
        )

    def body(c):
        fval, ia, ibx, lpx = c["fval"], c["pia"], c["pibx"], c["plpx"]
        fsc, fre, fmx = c["psc"], c["pre"], c["pmx"]
        active = c["active"]
        dirs_c = c["dirs"]
        step = c["step"]
        act0 = active  # busy rows at body entry (refill flush detection)

        from ..ops.pallas.step_select import select_fits

        if config.use_pallas and select_fits(P):
            from ..ops.pallas.step_select import step_select_kill

            # all seven fields of the B selected entries come out of the
            # kernel (invalid slots extract slot 0; the values are masked
            # by sel_valid everywhere that matters — trace records at
            # sel_valid=false positions are never reached by traceback)
            (
                fval, sel, sel_valid, any_alive, is_goal,
                ia_s, ibx_s, lpx_s, sc_s, re_s, mx_s,
            ) = step_select_kill(
                fval, ia, ibx, lpx, fsc, fre, fmx, active,
                B, L, interpret=jax.default_backend() != "tpu",
            )
            newly_exhausted = active & ~any_alive
            done_partial = c["done_partial"] | newly_exhausted
            active = active & any_alive
        else:
            sel1, any_alive = select_lex(fval, ibx, active)
            newly_exhausted = active & ~any_alive
            done_partial = c["done_partial"] | newly_exhausted
            active = active & any_alive

            ibx1 = jnp.take_along_axis(ibx, sel1[:, None], axis=1)[:, 0]
            is_goal = active & (((ibx1 >> 2) & 0xFFF) >= L)

            # ---- frontier selection: [S, B] slots
            if B == 1:
                sel = sel1[:, None]
                sel_valid = active[:, None]
            else:
                sel, topv = select_topB(fval, ibx, active)
                sel_valid = (topv > INT_MIN32) & active[:, None]
                # on goal acceptance only the goal itself is consumed
                sel = jnp.where(is_goal[:, None], sel1[:, None], sel)
                sel_valid = jnp.where(
                    is_goal[:, None],
                    jnp.arange(B)[None, :] == 0,
                    sel_valid,
                ) & active[:, None]
            # goal slot: when accepted, slot 0 carries the goal node
            sel = jnp.where(is_goal[:, None] & (jnp.arange(B)[None, :] == 0),
                            sel1[:, None], sel)

            taa = lambda a: jnp.take_along_axis(a, sel, axis=1)  # noqa: E731
            ia_s = taa(ia)  # [S, B]
            ibx_s = taa(ibx)
            lpx_s = taa(lpx)
            sc_s = taa(fsc)
            re_s = taa(fre)
            mx_s = taa(fmx)

            # ---- closed-kill: every pool entry matching an expanded
            # identity (one fused masked rewrite of fval; reads ia+ibx once)
            dead = jnp.zeros((S, P), bool)
            for b in range(B):
                dead = dead | (
                    (ia == ia_s[:, b : b + 1])
                    & ((ibx & IDENT_MASK) == (ibx_s[:, b : b + 1] & IDENT_MASK))
                    & sel_valid[:, b : b + 1]
                )
            fval = jnp.where(dead, INT_MIN32, fval)

        tpos = 1 + step * B  # slot 0 = start node (legacy) / zero sentinel
        slot_pos_c = tpos + jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (S, B)
        )
        zero = jnp.zeros((), jnp.int32)

        # ---- goal acceptance (active_pre feeds the inter-goal update: the
        # goal/cache-hit step's own records still compete for the inter goal)
        active_pre = active
        goal_idx = jnp.where(is_goal, slot_pos_c[:, 0], c["goal_idx"])
        active = active & ~is_goal

        # ---- path-cache short-circuit: probe ALL B frontier ranks (the
        # reference probes its term-node memo at EVERY pop,
        # hmm_graph_search.h:279-286; ranks 0..B-1 are the next B pops in
        # serial order, and the lowest-rank hit wins)
        cached_entry, cached_at = c["cached_entry"], c["cached_at"]
        if config.use_cache:
            hv = probe_cache(
                ia_s.reshape(S * B),
                ibx_s.reshape(S * B) & IDENT_MASK,
                jnp.repeat(dirs_c, B, total_repeat_length=S * B),
            ).reshape(S, B)
            hv = jnp.where(sel_valid & (hv >= 0), hv, -1)
            hit_b = jnp.argmax(hv >= 0, axis=1).astype(jnp.int32)
            hit_val = jnp.take_along_axis(hv, hit_b[:, None], axis=1)[:, 0]
            hit = active & (hit_val >= 0)
            cached_entry = jnp.where(hit, hit_val, cached_entry)
            cached_at = jnp.where(
                hit,
                jnp.take_along_axis(
                    slot_pos_c, hit_b[:, None], axis=1
                )[:, 0],
                cached_at,
            )
            active = active & ~hit

        expand_mask = sel_valid & ~is_goal[:, None] & active[:, None]
        trace_len = c["trace_len"] + sel_valid.sum(axis=1, dtype=jnp.int32)

        # ---- trace records + inter-goal candidate (small [S, B] math)
        s_sno = (ibx_s >> 2) & 0xFFF
        s_state = ibx_s & 3
        s_ne = (ibx_s >> NE_SHIFT) & 0x1FF
        s_len = lpx_s >> LEN_SHIFT
        pk = s_ne | (s_state << 9) | (s_sno << 11)
        tr_i = jnp.stack([ia_s, pk, (lpx_s & PARENT_MASK) - 1], axis=1)
        tr_f = re_s

        ev = re_s + _exit_prob(s_len, dt)
        ev = jnp.where(sel_valid, ev, NEG)
        best_b = jnp.argmax(ev, axis=1)
        best_ev = jnp.take_along_axis(ev, best_b[:, None], axis=1)[:, 0]
        best_pos = tpos + best_b.astype(jnp.int32)

        # starts are identified per node by a zero parent field (their
        # expansion is unpruned; under refill they occur at any step)
        root_flat = ((lpx_s & PARENT_MASK) == 0).reshape(S * B)

        use_k2 = (
            config.use_pallas_expand and graph.pt is not None
            and (S * B) % 8 == 0
        )
        expansions = c["expansions"]
        if use_k2:
            # ---- fused expansion kernel
            from ..ops.pallas.step_expand import step_expand

            pt_rows = graph.pt[
                jnp.clip(ia_s.reshape(S * B), 0, graph.num_rows - 1)
            ]
            ndir = jnp.repeat(dirs_c, B, total_repeat_length=S * B)
            (c_fval, c_ia, c_ibx, c_lpx, c_sc, c_re, c_mx, counts) = step_expand(
                pt_rows, hmm.hsuper,
                ia_s.reshape(S * B), ibx_s.reshape(S * B),
                lpx_s.reshape(S * B),
                sc_s.reshape(S * B), re_s.reshape(S * B), mx_s.reshape(S * B),
                expand_mask.reshape(S * B), ndir,
                slot_pos_c.reshape(S * B),
                W, L, config.prune_len,
                -math.log(config.low_cov_penalty), int(AA_STOP),
                interpret=jax.default_backend() != "tpu",
            )
            expansions = expansions + counts.sum(dtype=jnp.int32)
            cvalid = c_fval > INT_MIN32  # kernel stores dead slots INT_MIN
        else:
            # ---- expand
            ndir = jnp.repeat(dirs_c, B, total_repeat_length=S * B)
            c_fval, c_ia, c_ibx, c_lpx, c_sc, c_re, c_mx, cvalid = expand(
                ia_s.reshape(S * B),
                s_state.reshape(S * B),
                s_sno.reshape(S * B),
                ((ibx_s >> NEG_SHIFT) & 63).reshape(S * B),
                s_len.reshape(S * B),
                sc_s.reshape(S * B),
                re_s.reshape(S * B),
                mx_s.reshape(S * B),
                slot_pos_c.reshape(S * B),
                ndir,
                root_flat,
            )
            cvalid = cvalid & expand_mask.reshape(S * B)[:, None]
            expansions = expansions + cvalid.sum(dtype=jnp.int32)

        c_fval = c_fval.reshape(S, CAND0)
        c_ia = c_ia.reshape(S, CAND0)
        c_ibx = c_ibx.reshape(S, CAND0)
        c_lpx = c_lpx.reshape(S, CAND0)
        c_sc = c_sc.reshape(S, CAND0)
        c_re = c_re.reshape(S, CAND0)
        c_mx = c_mx.reshape(S, CAND0)
        cvalid = cvalid.reshape(S, CAND0)

        overflow = c["overflow"]
        # ---- candidate compression (turbo): keep top-CAND by fval. Most
        # of the CAND0 slots are dead (dBG out-degree ~1 -> ~5 valid per
        # expansion), so this makes the pool fill ~CAND0/CAND x slower and
        # the expensive compact sort run that much less often
        if CAND < CAND0:
            vc = cvalid.sum(axis=1, dtype=jnp.int32)
            ckey = jnp.where(cvalid, c_fval, INT_MIN32).astype(jnp.float32)
            _, keepi = jax.lax.approx_max_k(ckey, CAND, recall_target=0.99)
            take = lambda a: jnp.take_along_axis(a, keepi, axis=1)  # noqa: E731
            cvalid = take(cvalid) & (take(ckey) > INT_MIN32)
            # drop detection (covers both count overflow and
            # approximation misses): fewer valid survivors than
            # min(valid, CAND) means a valid candidate was dropped
            kv = cvalid.sum(axis=1, dtype=jnp.int32)
            overflow = overflow | (kv < jnp.minimum(vc, CAND))
            c_fval, c_ia, c_ibx, c_lpx = (
                take(c_fval), take(c_ia), take(c_ibx), take(c_lpx)
            )
            c_sc, c_re, c_mx = take(c_sc), take(c_re), take(c_mx)

        c_fval = jnp.where(
            cvalid, jnp.maximum(c_fval, INT_MIN32 + 2), INT_MIN32
        )

        # ---- inter-goal update
        inter_val, inter_idx = c["inter_val"], c["inter_idx"]
        better = active_pre & (best_ev > inter_val)
        inter_val = jnp.where(better, best_ev, inter_val)
        inter_idx = jnp.where(better, best_pos, inter_idx)

        out = dict(
            c, fval=fval, trace_len=trace_len, active=active,
            done_partial=done_partial, goal_idx=goal_idx,
            inter_idx=inter_idx, inter_val=inter_val, overflow=overflow,
            expansions=expansions, cached_entry=cached_entry,
            cached_at=cached_at,
        )

        if REFILL:
            # the hot body's ONLY refill cost: count residence steps (one
            # fused elementwise op). Flush + refill run in the OUTER loop
            # (flush_refill) — finished rows sit frozen (active False, all
            # registers final) for at most the inner idle-break window.
            out["r_steps"] = c["r_steps"] + act0.astype(jnp.int32)

        # ---- trace append at the step's fixed block (scatter-free)
        out["trace3"] = jax.lax.dynamic_update_slice(
            c["trace3"], tr_i, (zero, zero, tpos)
        )
        out["treal"] = jax.lax.dynamic_update_slice(
            c["treal"], tr_f, (zero, tpos)
        )

        # ---- append the whole candidate block at one shared offset
        # (per-plane in-place dynamic_update_slice writes, no scatters)
        dus = jax.lax.dynamic_update_slice
        nfree = c["next_free"]
        out["fval"] = dus(out["fval"], c_fval, (zero, nfree))
        out["pia"] = dus(c["pia"], c_ia, (zero, nfree))
        out["pibx"] = dus(c["pibx"], c_ibx, (zero, nfree))
        out["plpx"] = dus(c["plpx"], c_lpx, (zero, nfree))
        out["psc"] = dus(c["psc"], c_sc, (zero, nfree))
        out["pre"] = dus(c["pre"], c_re, (zero, nfree))
        out["pmx"] = dus(c["pmx"], c_mx, (zero, nfree))
        out["next_free"] = nfree + CAND
        out["step"] = step + 1
        return out

    def more_work(c):
        alive = c["active"].sum(dtype=jnp.int32)
        m = alive > act_thresh_d
        if REFILL:
            m = m | (c["head"] < Q)
        return m

    def inner_cond(c):
        alive = c["active"].sum(dtype=jnp.int32)
        ok = (
            ((alive > act_thresh_d) | ((c["head"] < Q) if REFILL else False))
            & (c["step"] < max_steps_d)
            & (c["next_free"] + CAND <= P)
        )
        if REFILL:
            # break to the outer flush/refill once enough rows idle (while
            # queue items remain) or any item exhausts its residence budget
            ok = ok & ~((c["head"] < Q) & (S - alive > IDLE_MAX))
            ok = ok & (jnp.max(c["r_steps"]) < item_cap_d)
        return ok

    def flush_refill(c):
        """Outer-loop item turnover: flush finished/capped rows' registers
        to the per-item table, compact the pool when near-full, and load
        the next queued items into the idle rows (start entries ride ONE
        shared pool column)."""
        active, r_item, r_steps = c["active"], c["r_item"], c["r_steps"]
        capped = active & (r_steps >= item_cap_d)  # deferred to the ladder
        fin = (r_item >= 0) & (~active | capped)
        pkr = pack_regs(c, capped.astype(jnp.int32))
        idx_t = jnp.where(fin, r_item, Q)
        c = dict(
            c,
            outm=c["outm"].at[idx_t].set(pkr, mode="drop"),
            r_item=jnp.where(fin, -1, r_item),
            active=active & ~capped,
            fval=jnp.where(fin[:, None], INT_MIN32, c["fval"]),
            r_steps=jnp.where(fin, 0, r_steps),
        )
        c = jax.lax.cond(
            c["next_free"] + 2 * CAND + 2 > P, compact, lambda x: x, c
        )
        idle = c["r_item"] < 0
        rank = jnp.cumsum(idle.astype(jnp.int32)) - 1
        new_item = c["head"] + rank
        take_r = idle & (new_item < Q)
        ni = jnp.clip(new_item, 0, Q - 1)
        nsi = start_ints[ni]  # [S, 8] row gathers
        nsf = start_floats[ni].astype(dt)
        rst = lambda a, v: jnp.where(take_r, v, a)  # noqa: E731
        nf_node = nsi[:, NI_NODE]
        has = take_r & (nf_node >= 0)
        rf_fval = jnp.where(
            has, jnp.maximum(nsi[:, NI_FVAL], INT_MIN32 + 2), INT_MIN32
        )
        rf_ibx = pack_ibx(
            nsi[:, NI_STATE], nsi[:, NI_STATE_NO], nsi[:, NI_NEG],
            nsi[:, NI_NE],
        )
        rf_lpx = pack_lpx(nsi[:, NI_PARENT], nsi[:, NI_LEN])
        nf = c["next_free"]
        zero = jnp.zeros((), jnp.int32)
        dus = jax.lax.dynamic_update_slice
        col = lambda a, v: dus(a, v[:, None], (zero, nf))  # noqa: E731
        return dict(
            c,
            head=c["head"] + take_r.sum(dtype=jnp.int32),
            r_item=jnp.where(take_r, new_item, c["r_item"]),
            dirs=rst(c["dirs"], dirs[ni].astype(jnp.int32)),
            r_tstart=rst(c["r_tstart"], 1 + c["step"] * B),
            active=c["active"] | take_r,
            goal_idx=rst(c["goal_idx"], -1),
            inter_idx=rst(c["inter_idx"], -1),
            inter_val=jnp.where(take_r, jnp.asarray(NEG, dt), c["inter_val"]),
            cached_entry=rst(c["cached_entry"], -1),
            cached_at=rst(c["cached_at"], -1),
            overflow=jnp.where(take_r, False, c["overflow"]),
            fval=col(c["fval"], rf_fval),
            pia=col(c["pia"], nf_node),
            pibx=col(c["pibx"], rf_ibx),
            plpx=col(c["plpx"], rf_lpx),
            psc=col(c["psc"], nsf[:, NF_SCORE]),
            pre=col(c["pre"], nsf[:, NF_REAL]),
            pmx=col(c["pmx"], nsf[:, NF_MAX]),
            next_free=nf + 1,
        )

    def outer_body(c):
        c = jax.lax.while_loop(inner_cond, body, c)
        if REFILL:
            return flush_refill(c)
        return compact(c)

    def outer_cond(c):
        return more_work(c) & (c["step"] < max_steps_d)

    carry = jax.lax.while_loop(outer_cond, outer_body, carry)

    if REFILL:
        # final flush: rows still busy at the step cap -> their items are
        # DEFERRED (active flag 1); rows idle flush nothing. Items never
        # dequeued keep the init row (active flag 1) and are deferred too.
        pkr = pack_regs(carry, jnp.ones((S,), jnp.int32))
        idx_t = jnp.where(carry["r_item"] >= 0, carry["r_item"], Q)
        outm = carry["outm"].at[idx_t].set(pkr, mode="drop")
        meta = outm[:, :7]
        return {
            "trace3": carry["trace3"],
            "treal": carry["treal"],
            "trace_len": carry["trace_len"],
            "goal_idx": outm[:, 0],
            "inter_idx": outm[:, 1],
            "done_partial": carry["done_partial"],
            "overflow": outm[:, 5] != 0,
            "expansions": carry["expansions"],
            "steps": carry["step"],
            "active": outm[:, 4] != 0,
            "cached_entry": outm[:, 2],
            "cached_at": outm[:, 3],
            "row_of": outm[:, 7],
            "tstart": outm[:, 8],
            "meta": meta,
            "scal": jnp.stack(
                [
                    carry["step"], carry["expansions"],
                    (outm[:, 5] != 0).sum(dtype=jnp.int32),
                ]
            ),
        }

    return {
        "trace3": carry["trace3"],
        "treal": carry["treal"],
        "trace_len": carry["trace_len"],
        "goal_idx": carry["goal_idx"],
        "inter_idx": carry["inter_idx"],
        "done_partial": carry["done_partial"],
        "overflow": carry["overflow"],
        "expansions": carry["expansions"],
        "steps": carry["step"],
        "active": carry["active"],
        "cached_entry": carry["cached_entry"],
        "cached_at": carry["cached_at"],
        # packed copies of the small outputs: on a tunneled TPU every
        # host fetch pays a ~30 ms round trip, so the runner reads ONE
        # [S, 4] row block + ONE scalar triple instead of seven arrays
        # col 6 = the seed's inter-goal VALUE (real + exit_prob at the best
        # node popped so far), f32-bitcast — compose replays the
        # reference's exit-prob acceptance against the cached walk
        "meta": jnp.stack(
            [
                carry["goal_idx"], carry["inter_idx"],
                carry["cached_entry"], carry["cached_at"],
                carry["active"].astype(jnp.int32),
                carry["overflow"].astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    carry["inter_val"].astype(jnp.float32), jnp.int32
                ),
            ],
            1,
        ),
        "scal": jnp.stack(
            [
                carry["step"], carry["expansions"],
                carry["overflow"].sum(dtype=jnp.int32),
            ]
        ),
    }
