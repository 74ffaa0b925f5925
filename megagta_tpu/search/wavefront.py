"""Batched TPU wavefront search: many seeds' A* searches advanced in lockstep.

This is the TPU-native replacement for the reference's per-seed serial A*
with an OpenMP loop over seeds (src/search.cpp:184-188). Design:

  * The parallel axes are SEEDS x FRONTIER WIDTH: S searches run in lockstep
    inside one jitted lax.while_loop, each expanding the top-B frontier
    nodes per step (SURVEY.md section 7: wavefront batched DP). All graph
    navigation is gathers into the SdBG's precomputed succ/invalid/
    is_multi1 arrays — the 3-hop 64-codon walk of node_enumerator.h:98-128
    becomes three [S*B, 4^h] gathers.
  * Exact-semantics pool: the serial algorithm's open_hash dedup
    (hmm_graph_search.h:294-331) only avoids pushing dominated duplicates;
    pushing everything and skipping closed identities at pop time yields the
    IDENTICAL expansion sequence. The pool is therefore append-only with
    lazy "kill all entries matching expanded identities" masking, plus
    compaction when full.
  * Goal acceptance stays exact for every B: a goal node is accepted only
    when it is the lexicographic maximum of the whole pool — precisely the
    serial "goal popped first" condition (a_star_node.h:34-83 ordering:
    max fval, then min state_no, then state m > d > i).
  * Traceback: every expanded node appends one record to a trace arena
    (parent index, packed codon emission, state, real_score, length);
    contigs are reconstructed host-side from the goal/inter-goal chain
    (partialResultFromGoal, hmm_graph_search.h:83-109).

With expand_width B == 1 the expansion sequence equals the serial oracle's
exactly (tested bit-for-bit in float64). B > 1 explores a superset per step
(the reference's own semantics do not define an order among equal-priority
pops); the acceptance rule above keeps results equal in practice and ~B x
faster.

Other differences vs the serial oracle (documented, tested):
  * no cross-seed term-node cache (a shared-memory speed memo whose effect
    depends on thread timing in the reference; SURVEY.md risk list)
  * pool overflow evicts worst-priority entries (reported via a flag)
  * float32 scores on TPU (float64 under JAX x64 for exactness tests)
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

__all__ = [
    "DeviceGraph",
    "DeviceHMM",
    "WavefrontConfig",
    "wavefront_search",
    "extract_chains",
]


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceGraph:
    """Graph tables for the search kernel.

    Two layouts (the search stage never mutates `invalid` — the reference
    loads the final graph read-only, src/search.cpp:98 — so the whole 3-hop
    codon expansion of node_enumerator.h:98-128 is structurally static):

    * hop tables (default): `succ3 [size+1, 64]` = the 64 codon-path target
      rows per source row, `flags3 [size+1, 64]` int8 bit0 = path valid
      (all 3 hops exist, every hop + the source row valid), bit1 = low-cov
      (all 3 hops multiplicity 1). One coalesced 256-byte row gather per
      expansion instead of 3 nested scattered gathers (27 ms -> ~2 ms per
      step at [8192, 64] on v5e).
    * raw tables (memory fallback for graphs too big for 260 B/edge):
      `succ [size+1, 4]`, `invalid`, `is_multi1`, walked 3 levels deep in
      the kernel.
    """

    succ: jnp.ndarray | None  # [size+1, 4] int32 (row `size` = sentinel)
    invalid: jnp.ndarray | None  # [size+1] bool
    is_multi1: jnp.ndarray | None  # [size+1] bool
    succ3: jnp.ndarray | None = None  # [size+1, 64] int32
    flags3: jnp.ndarray | None = None  # [size+1, 64] int8

    def tree_flatten(self):
        return (self.succ, self.invalid, self.is_multi1, self.succ3, self.flags3), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_rows(self) -> int:
        arr = self.succ3 if self.succ3 is not None else self.succ
        return arr.shape[0]

    # beyond this many rows the hop tables (260 B/row) are skipped in favor
    # of the raw-table kernel path (keeps HBM for the pool/trace arenas)
    HOP_TABLE_MAX_ROWS = 24_000_000

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
        flags3 = (v.astype(np.int8) | (low.astype(np.int8) << 1)).astype(np.int8)
        return DeviceGraph(
            succ=None,
            invalid=None,
            is_multi1=None,
            succ3=jnp.asarray(l3),
            flags3=jnp.asarray(flags3),
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceHMM:
    msc: jnp.ndarray  # [L+1, 22] (cols 20/21 = -inf)
    isc: jnp.ndarray  # [L+1, 22]
    trans: jnp.ndarray  # [L+1, 7]
    mme: jnp.ndarray  # [L+1]
    h: jnp.ndarray  # [3, L+1] heuristic (m, i, d)
    # codon-indexed emission tables: msc64[s, c] = msc[s, aa(codon c)]
    # (aa64 is a static per-direction table, so pre-applying it turns the
    # per-candidate 2D emission gather into a coalesced 256 B row gather)
    msc64: jnp.ndarray | None = None  # [L+1, 64]
    isc64: jnp.ndarray | None = None  # [L+1, 64]

    def tree_flatten(self):
        return (
            self.msc, self.isc, self.trans, self.mme, self.h,
            self.msc64, self.isc64,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def L(self) -> int:
        return self.msc.shape[0] - 1

    @staticmethod
    def stack(a: "DeviceHMM", b: "DeviceHMM") -> "DeviceHMM":
        """Direction-stacked tables [2, ...] for the merged fwd+rev run.

        The codon tables are direction-specific: row 0 uses the forward
        codon->aa map, row 1 the reverse-complement map (build_aa64)."""
        st = lambda x, y: jnp.stack([x, y])  # noqa: E731

        def codon_tab(dev: "DeviceHMM", forward: bool):
            aa = jnp.asarray(build_aa64(forward))
            return dev.msc[:, aa], dev.isc[:, aa]

        m0, i0 = codon_tab(a, True)
        m1, i1 = codon_tab(b, False)
        return DeviceHMM(
            msc=st(a.msc, b.msc),
            isc=st(a.isc, b.isc),
            trans=st(a.trans, b.trans),
            mme=st(a.mme, b.mme),
            h=st(a.h, b.h),
            msc64=st(m0, m1),
            isc64=st(i0, i1),
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
    pool_size: int = 1 << 14
    max_steps: int = 1 << 12
    prune_len: int = 20
    low_cov_penalty: float = 0.5
    expand_width: int = 1  # B: frontier nodes expanded per seed per step
    # B>1 only: keep the top-cand_cap candidates by fval of the B*129
    # produced per step (0 = keep all). Typical valid counts are ~5 per
    # expansion (dBG out-degree ~1), so a cap of ~2*129 is lossless in
    # practice while making the pool grow ~B x slower (fewer compact sorts);
    # drops are flagged via `overflow`.
    cand_cap: int = 0
    use_cache: bool = False  # cross-seed path-cache short-circuit (turbo)
    use_pallas: bool = False  # fused Pallas pool-selection kernel
    # None = auto (hop tables unless the graph exceeds the HBM threshold);
    # False forces the raw 3-gather kernel path
    precompute_hops: bool | None = None
    dtype: object = jnp.float32


# pool/trace field indices (SoA int32 / float arrays)
# int fields: node_id, state_no, state(0=m 1=i 2=d), fval, neg_count, length,
#             parent(trace idx), ne(packed codon)
NI_NODE, NI_STATE_NO, NI_STATE, NI_FVAL, NI_NEG, NI_LEN, NI_PARENT, NI_NE = range(8)
# float fields: score, real_score, max_score
NF_SCORE, NF_REAL, NF_MAX = range(3)

_STATE_RANK = jnp.asarray([3, 2, 1], jnp.int32)  # m, i, d


def _priority_keys(ints):
    """(key1, key2) for lexicographic max selection."""
    k1 = ints[..., NI_FVAL]
    k2 = ((32767 - ints[..., NI_STATE_NO]) << 4) | _STATE_RANK[ints[..., NI_STATE]]
    return k1, k2


def _argmax_lex(k1, k2, alive):
    """Index of the lexicographic max (k1, k2) among alive; ties -> lowest
    index (heap order in the reference is unspecified for full ties)."""
    k1m = jnp.where(alive, k1, INT_MIN32)
    best1 = jnp.max(k1m, axis=-1, keepdims=True)
    tie = (k1m == best1) & alive
    k2m = jnp.where(tie, k2, INT_MIN32)
    best2 = jnp.max(k2m, axis=-1, keepdims=True)
    cand = tie & (k2m == best2)
    idx = jnp.argmax(cand, axis=-1)
    any_alive = jnp.any(alive, axis=-1)
    return idx, any_alive


def _exit_prob(length, dtype):
    l = jnp.minimum(length, 2999).astype(dtype)
    return 2.0 * jnp.log(2.0 / (l + 2.0))


def build_aa64(forward: bool) -> np.ndarray:
    return (CODON_TABLE_FLAT if forward else RC_CODON_TABLE_FLAT).astype(np.int32)


def _to_fval(x):
    # (int) cast clamped like the reference's x86 behavior (node_enumerator
    # .h:173): out-of-range -> INT_MIN
    ok = (x > INT_MIN32) & (x < 2**31 - 1)
    return jnp.where(ok, x.astype(jnp.int32), INT_MIN32)


@partial(jax.jit, static_argnames=("maxc",))
def extract_chains(trace_i, trace_f, start_idx, maxc: int):
    """Walk parent pointers on device; return compact child->root chains.

    Replaces host-side traceback over the full trace arenas: on a tunneled
    TPU the [R, T, 8] arena transfer dominates wall-clock, while the chains
    the host actually needs are [R, maxc] (~30x smaller). Returns
    (nodes [R, maxc] int32, packed [R, maxc] int32, reals [R, maxc]):
    packed = ne | state << 9 | state_no << 11, -1 marks past-end slots.
    Chain entry 0 is `start_idx` itself; the last valid entry is the root
    (trace parent -1, cf. runner traceback of hmm_graph_search.h:83-109).
    """

    def step(idx, _):
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        ints = jnp.take_along_axis(trace_i, safe[:, None, None], axis=1)[:, 0]
        reals = jnp.take_along_axis(
            trace_f[..., NF_REAL], safe[:, None], axis=1
        )[:, 0]
        node = jnp.where(valid, ints[:, NI_NODE], -1)
        packed = (
            ints[:, NI_NE]
            | (ints[:, NI_STATE] << 9)
            | (ints[:, NI_STATE_NO] << 11)
        )
        packed = jnp.where(valid, packed, -1)
        parent = ints[:, NI_PARENT]
        # self-referencing records (e.g. zero-filled padding) terminate
        nxt = jnp.where(valid & (parent != idx), parent, -1)
        return nxt, (node, packed, jnp.where(valid, reals, 0.0))

    _, (nodes, packed, reals) = jax.lax.scan(
        step, start_idx, None, length=maxc
    )
    return (
        jnp.transpose(nodes),
        jnp.transpose(packed),
        jnp.transpose(reals),
    )


@partial(
    jax.jit,
    static_argnames=("config", "model_length"),
)
def wavefront_search_merged(
    graph: DeviceGraph,
    hmm: DeviceHMM,  # direction-stacked tables [2, ...] (DeviceHMM.stack)
    dirs: jnp.ndarray,  # [S] int32: 0 = forward HMM, 1 = reverse HMM
    start_ints: jnp.ndarray,  # [S, 8] int32 initial nodes
    start_floats: jnp.ndarray,  # [S, 3] dtype
    config: WavefrontConfig,
    model_length: int,
    cache_a: jnp.ndarray | None = None,  # [2, H] identity word a (-1 empty)
    cache_b: jnp.ndarray | None = None,  # [2, H] identity word b
    cache_val: jnp.ndarray | None = None,  # [2, H] host entry index
):
    """Run S lockstep searches. Returns dict of results + trace arenas.

    Data-movement design: every step appends a full CAND-slot block at the
    SAME offset for all seeds (invalid slots are stored dead), and traces
    the B selected nodes at slot 1 + step*B. All writes are therefore
    dynamic_update_slice with scalar offsets — no scatters in the loop
    (TPU scatters serialize and dominated earlier profiles at ~7 ms/step).
    """
    S = start_ints.shape[0]
    P = config.pool_size
    B = config.expand_width
    dt = config.dtype
    L = model_length
    CAND0 = B * 129
    CAND = (
        min(config.cand_cap, CAND0)
        if (B > 1 and config.cand_cap > 0)
        else CAND0
    )
    T = config.max_steps * B + 1

    aa64_2 = jnp.stack(
        [jnp.asarray(build_aa64(True)), jnp.asarray(build_aa64(False))]
    )  # [2, 64] aa codes per direction
    low_cov_pen = jnp.asarray(-math.log(config.low_cov_penalty), dt)

    # candidate slot labels: slots 0..63 match, 64..127 insert, 128 delete
    c1 = jnp.arange(64, dtype=jnp.int32) // 16
    c2 = (jnp.arange(64, dtype=jnp.int32) // 4) % 4
    c3 = jnp.arange(64, dtype=jnp.int32) % 4
    ne64 = (c1 << 6) | (c2 << 3) | c3

    pool_i = jnp.zeros((S, P, 8), jnp.int32)
    pool_f = jnp.full((S, P, 3), 0.0, dt)
    alive = jnp.zeros((S, P), bool)

    # seed pool with the start nodes at slot 0
    pool_i = pool_i.at[:, 0, :].set(start_ints)
    pool_f = pool_f.at[:, 0, :].set(start_floats)
    alive = alive.at[:, 0].set(start_ints[:, NI_NODE] >= 0)
    next_free = jnp.ones((), jnp.int32)  # shared by all seeds (see above)

    trace_i = jnp.zeros((S, T, 8), jnp.int32)
    trace_f = jnp.zeros((S, T, 3), dt)
    trace_len = jnp.zeros((S,), jnp.int32)

    active = jnp.ones((S,), bool)
    done_partial = jnp.zeros((S,), bool)
    goal_idx = jnp.full((S,), -1, jnp.int32)  # trace idx of accepted goal
    # the start node (trace slot 0) is the initial inter goal
    inter_idx = jnp.zeros((S,), jnp.int32)
    inter_val = jnp.full((S,), NEG, dt)
    overflow = jnp.zeros((S,), bool)
    expansions = jnp.zeros((), jnp.int32)
    cached_entry = jnp.full((S,), -1, jnp.int32)  # host cache entry on hit
    cached_at = jnp.full((S,), -1, jnp.int32)  # trace pos of the hit node

    # immediate goal: start already past the model end (hmm_graph_search.h:193)
    start_is_goal = start_ints[:, NI_STATE_NO] >= L

    def expand(ints, floats, parent_idx, skip_prune):
        """All 129 successor candidates per input node.

        ints [N, 8], floats [N, 3], parent_idx [N] -> ([N, 129, 8],
        [N, 129, 3], [N, 129] valid). N = S * B.
        """
        N = ints.shape[0]
        node = ints[:, NI_NODE]
        state = ints[:, NI_STATE]
        state_no = ints[:, NI_STATE_NO]
        next_state = jnp.minimum(state_no + 1, L)
        ndir = jnp.repeat(dirs, N // S, total_repeat_length=N)  # [N]
        aa64 = aa64_2[ndir]  # [N, 64]
        not_stop = aa64 != AA_STOP

        t = hmm.trans[ndir, jnp.minimum(state_no, L)]  # [N, 7]
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
        mme = hmm.mme[ndir, next_state]  # [N]

        # 3-hop codon gather
        safe_node = jnp.clip(node, 0, graph.num_rows - 1)
        if graph.succ3 is not None:
            # precomputed hop tables: one coalesced row gather
            l3 = graph.succ3[safe_node]  # [N, 64]
            fl = graph.flags3[safe_node]
            v3 = ((fl & 1) != 0) & (node >= 0)[:, None]
            low_cov = jnp.where((fl & 2) != 0, low_cov_pen, 0.0)
        else:
            l1 = graph.succ[safe_node]  # [N, 4]
            v1 = ~graph.invalid[l1]
            l2 = graph.succ[l1].reshape(N, 16)
            v2 = ~graph.invalid[l2] & jnp.repeat(v1, 4, axis=1)
            l3 = graph.succ[l2].reshape(N, 64)
            v3 = ~graph.invalid[l3] & jnp.repeat(v2, 4, axis=1)
            v3 = v3 & (node >= 0)[:, None] & ~graph.invalid[safe_node][:, None]

            m1 = graph.is_multi1[jnp.repeat(l1, 16, axis=1)]
            m2 = graph.is_multi1[jnp.repeat(l2, 4, axis=1)]
            m3 = graph.is_multi1[l3]
            low_cov = jnp.where(m1 & m2 & m3, low_cov_pen, 0.0)

        # codon-indexed row gathers (msc64[d, s, c] == msc[d, s, aa64_2[d, c]]
        # by construction in DeviceHMM.stack): one coalesced 256 B row per
        # candidate instead of a 64-element scattered gather — elementwise
        # gathers measured ~8 us/1k elements on v5e vs ~free row gathers
        msc = hmm.msc64[ndir, next_state]  # [N, 64]
        isc = hmm.isc64[ndir, next_state]

        score = floats[:, NF_SCORE][:, None]
        real = floats[:, NF_REAL][:, None]
        mx = floats[:, NF_MAX][:, None]

        # ---- match candidates (slots 0..63)
        m_real = real + match_tr[:, None] + msc - low_cov
        m_improved = m_real >= mx
        m_max = jnp.where(m_improved, m_real, mx)
        m_neg = jnp.where(m_improved, 0, ints[:, NI_NEG][:, None] + 1)
        m_score = score + match_tr[:, None] + msc - low_cov - mme[:, None]
        m_fval = _to_fval(SCALE * (m_score + HWEIGHT * hmm.h[ndir, 0, next_state][:, None]))
        m_valid = v3 & not_stop

        # ---- insert candidates (slots 64..127); forbidden from 'd'
        i_real = real + ins_tr[:, None] + isc - low_cov
        i_score = score + ins_tr[:, None] + isc - low_cov
        i_fval = _to_fval(
            SCALE
            * (i_score + HWEIGHT * hmm.h[ndir, 1, jnp.minimum(state_no, L)][:, None])
        )
        i_valid = m_valid & (state != 2)[:, None]

        # ---- delete candidate (slot 128); forbidden from 'i'
        d_real = real[:, 0] + del_tr
        d_score = score[:, 0] + del_tr - mme
        d_fval = _to_fval(SCALE * (d_score + HWEIGHT * hmm.h[ndir, 2, next_state]))
        d_valid = (state != 1) & (node >= 0)

        cand_node = jnp.concatenate([l3, l3, safe_node[:, None]], axis=1)
        cand_state = jnp.concatenate(
            [
                jnp.zeros((N, 64), jnp.int32),
                jnp.ones((N, 64), jnp.int32),
                jnp.full((N, 1), 2, jnp.int32),
            ],
            axis=1,
        )
        cand_state_no = jnp.concatenate(
            [
                jnp.broadcast_to(next_state[:, None], (N, 64)),
                jnp.broadcast_to(state_no[:, None], (N, 64)),
                next_state[:, None],
            ],
            axis=1,
        )
        cand_fval = jnp.concatenate([m_fval, i_fval, d_fval[:, None]], axis=1)
        cand_neg = jnp.concatenate(
            [
                m_neg,
                ints[:, NI_NEG][:, None] + jnp.ones((N, 64), jnp.int32),
                ints[:, NI_NEG][:, None] + 1,
            ],
            axis=1,
        )
        cand_len = jnp.concatenate(
            [
                jnp.broadcast_to((ints[:, NI_LEN] + 1)[:, None], (N, 128)),
                ints[:, NI_LEN][:, None],
            ],
            axis=1,
        )
        cand_ne = jnp.concatenate(
            [
                jnp.broadcast_to(ne64[None, :], (N, 64)),
                jnp.broadcast_to(ne64[None, :], (N, 64)),
                jnp.full((N, 1), (4 << 6) | (4 << 3) | 4, jnp.int32),
            ],
            axis=1,
        )
        cand_score = jnp.concatenate([m_score, i_score, d_score[:, None]], axis=1)
        cand_real = jnp.concatenate([m_real, i_real, d_real[:, None]], axis=1)
        cand_max = jnp.concatenate(
            [m_max, jnp.broadcast_to(mx, (N, 64)), mx], axis=1
        )
        valid = jnp.concatenate([m_valid, i_valid, d_valid[:, None]], axis=1)

        # pruning (hmm_graph_search.h:292-310); the start node's expansion is
        # pushed unpruned in the reference (hmm_graph_search.h:217-234)
        if config.prune_len > 0:
            keep = ((cand_len < 5) | (cand_neg <= config.prune_len)) & (
                cand_real > 0.0
            )
            valid = valid & (keep | skip_prune)

        ci = jnp.stack(
            [
                cand_node,
                cand_state_no,
                cand_state,
                cand_fval,
                cand_neg,
                cand_len,
                jnp.broadcast_to(parent_idx[:, None], (N, 129)),
                cand_ne,
            ],
            axis=-1,
        )
        cf = jnp.stack([cand_score, cand_real, cand_max], axis=-1)
        return ci, cf, valid

    def probe_cache(ids_a, ids_b):
        """4-probe open-address lookup of identities; -1 on miss.

        The cross-seed path cache is the deterministic counterpart of the
        reference's term-node memo (hmm_graph_search.h:211-234): a hit means
        a previous seed's best path already passes through this (node,
        state, state_no); the search short-circuits and the host composes
        prefix + cached suffix.
        """
        H = cache_a.shape[1]
        ua = ids_a.astype(jnp.uint32)
        ub = ids_b.astype(jnp.uint32)
        h = (ua * jnp.uint32(2654435761) ^ (ub * jnp.uint32(40503))).astype(
            jnp.uint32
        )
        val = jnp.full(ids_a.shape, -1, jnp.int32)
        for probe in range(4):
            idx = ((h + jnp.uint32(probe)) % jnp.uint32(H)).astype(jnp.int32)
            hit = (cache_a[dirs, idx] == ids_a) & (cache_b[dirs, idx] == ids_b)
            val = jnp.where((val < 0) & hit, cache_val[dirs, idx], val)
        return val

    def compact(state):
        """Squeeze alive entries (best priority first) to the row fronts.

        The payload rides through one multi-operand lax.sort — TPU sorts are
        fast (~0.2 ms at [128,16K]) while take_along_axis row gathers of the
        pool cost ~100x more, so permute-by-gather is avoided entirely.
        Entries beyond the append headroom are evicted worst-first (rare;
        flagged per seed via `overflow`).
        """
        pool_i, pool_f, alive, next_free, overflow = state
        k1, _ = _priority_keys(pool_i)
        k1c = jnp.maximum(k1, INT_MIN32 + 2)
        key = jnp.where(alive, -k1c, 2**31 - 1)
        ops = (
            key,
            alive,
            *(pool_i[..., j] for j in range(8)),
            *(pool_f[..., j] for j in range(3)),
        )
        sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        alive = sorted_ops[1]
        pool_i = jnp.stack(sorted_ops[2:10], axis=-1)
        pool_f = jnp.stack(sorted_ops[10:13], axis=-1)
        counts = alive.sum(axis=-1).astype(jnp.int32)
        over = counts > P - CAND
        overflow = overflow | over
        alive = alive & (jnp.arange(P)[None, :] < P - CAND)
        nf = jnp.minimum(jnp.max(counts), P - CAND)
        return pool_i, pool_f, alive, nf, overflow

    def body(carry):
        (
            pool_i, pool_f, alive, next_free, trace_i, trace_f, trace_len,
            active, done_partial, goal_idx, inter_idx, inter_val, overflow,
            expansions, cached_entry, cached_at, step,
        ) = carry

        alive_act = alive & active[:, None]
        if config.use_pallas:
            from ..ops.pallas.pool_select import pool_select

            sel1, any_alive = pool_select(
                pool_i, alive_act, interpret=jax.default_backend() != "tpu"
            )
            k1, _ = _priority_keys(pool_i)
        else:
            k1, k2 = _priority_keys(pool_i)
            sel1, any_alive = _argmax_lex(k1, k2, alive_act)
        newly_exhausted = active & ~any_alive
        done_partial = done_partial | newly_exhausted
        active = active & any_alive

        top1_i = jnp.take_along_axis(pool_i, sel1[:, None, None], axis=1)[:, 0]
        is_goal = active & (top1_i[:, NI_STATE_NO] >= L)

        # ---- frontier selection: [S, B] slots
        if B == 1:
            sel = sel1[:, None]
            sel_valid = active[:, None]
        else:
            nk1 = jnp.where(
                alive_act & (pool_i[..., NI_STATE_NO] < L), k1, INT_MIN32
            )
            # approx_max_k: TPU-native tiled selection (exact top_k lowers
            # to a full sort per step). Turbo-mode selection only needs a
            # high-recall top-B; goal acceptance stays exact via sel1.
            fk1 = nk1.astype(jnp.float32)
            _, sel = jax.lax.approx_max_k(fk1, B, recall_target=0.95)
            topv = jnp.take_along_axis(nk1, sel, axis=1)
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

        sel_i = jnp.take_along_axis(pool_i, sel[..., None], axis=1)  # [S,B,8]
        sel_f = jnp.take_along_axis(pool_f, sel[..., None], axis=1)

        # ---- closed-kill: every pool entry matching an expanded identity.
        # identities packed into one int32 pair for a broadcast compare
        def ident(ints):
            a = ints[..., NI_NODE]
            b2 = (ints[..., NI_STATE_NO] << 2) | ints[..., NI_STATE]
            return a, b2

        pa, pb = ident(pool_i)  # [S, P+1]
        sa, sb = ident(sel_i)  # [S, B]
        same = (pa[:, :, None] == sa[:, None, :]) & (pb[:, :, None] == sb[:, None, :])
        kill = jnp.any(same & sel_valid[:, None, :], axis=-1)
        alive = alive & ~kill

        # ---- trace append at the step's fixed block (scatter-free)
        tpos = 1 + step * B  # slot 0 = start node
        slot_pos_c = tpos + jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (S, B)
        )
        write_ok = sel_valid
        zero = jnp.zeros((), jnp.int32)
        trace_i = jax.lax.dynamic_update_slice(trace_i, sel_i, (zero, tpos, zero))
        trace_f = jax.lax.dynamic_update_slice(trace_f, sel_f, (zero, tpos, zero))
        trace_len = trace_len + sel_valid.sum(axis=1, dtype=jnp.int32)

        # ---- inter-goal update (hmm_graph_search.h:274-277)
        ev = sel_f[..., NF_REAL] + _exit_prob(sel_i[..., NI_LEN], dt)
        ev = jnp.where(write_ok, ev, NEG)
        best_b = jnp.argmax(ev, axis=1)
        best_ev = jnp.take_along_axis(ev, best_b[:, None], axis=1)[:, 0]
        better = active & (best_ev > inter_val)
        inter_val = jnp.where(better, best_ev, inter_val)
        inter_idx = jnp.where(
            better, jnp.take_along_axis(slot_pos_c, best_b[:, None], axis=1)[:, 0],
            inter_idx,
        )

        # ---- goal acceptance
        goal_idx = jnp.where(is_goal, slot_pos_c[:, 0], goal_idx)
        active = active & ~is_goal

        # ---- path-cache short-circuit on the rank-1 frontier node
        if config.use_cache:
            hit_val = probe_cache(
                sel_i[:, 0, NI_NODE],
                (sel_i[:, 0, NI_STATE_NO] << 2) | sel_i[:, 0, NI_STATE],
            )
            hit = active & sel_valid[:, 0] & (hit_val >= 0)
            cached_entry = jnp.where(hit, hit_val, cached_entry)
            cached_at = jnp.where(hit, slot_pos_c[:, 0], cached_at)
            active = active & ~hit

        # ---- expand
        expand_mask = sel_valid & ~is_goal[:, None] & active[:, None]
        ci, cf, cvalid = expand(
            sel_i.reshape(S * B, 8),
            sel_f.reshape(S * B, 3),
            slot_pos_c.reshape(S * B),
            step == 0,
        )
        cvalid = cvalid & expand_mask.reshape(S * B)[:, None]
        ci = ci.reshape(S, CAND0, 8)
        cf = cf.reshape(S, CAND0, 3)
        cvalid = cvalid.reshape(S, CAND0)
        expansions = expansions + cvalid.sum(dtype=jnp.int32)

        # ---- candidate compression (turbo): keep top-CAND by fval so the
        # pool grows ~B x slower between compact sorts
        if CAND < CAND0:
            ckey = jnp.where(cvalid, ci[..., NI_FVAL], INT_MIN32).astype(
                jnp.float32
            )
            _, keep = jax.lax.approx_max_k(ckey, CAND, recall_target=0.99)
            overflow = overflow | (
                cvalid.sum(axis=1, dtype=jnp.int32) > CAND
            )
            kept_key = jnp.take_along_axis(ckey, keep, axis=1)
            ci = jnp.take_along_axis(ci, keep[..., None], axis=1)
            cf = jnp.take_along_axis(cf, keep[..., None], axis=1)
            cvalid = jnp.take_along_axis(cvalid, keep, axis=1) & (
                kept_key > INT_MIN32
            )

        # ---- compact pool when needed
        need = next_free + CAND > P
        pool_i, pool_f, alive, next_free, overflow = jax.lax.cond(
            need,
            compact,
            lambda s: s,
            (pool_i, pool_f, alive, next_free, overflow),
        )

        # ---- append the whole candidate block at one shared offset
        zero2 = jnp.zeros((), jnp.int32)
        pool_i = jax.lax.dynamic_update_slice(pool_i, ci, (zero2, next_free, zero2))
        pool_f = jax.lax.dynamic_update_slice(pool_f, cf, (zero2, next_free, zero2))
        alive = jax.lax.dynamic_update_slice(alive, cvalid, (zero2, next_free))
        next_free = next_free + CAND

        return (
            pool_i, pool_f, alive, next_free, trace_i, trace_f, trace_len,
            active, done_partial, goal_idx, inter_idx, inter_val, overflow,
            expansions, cached_entry, cached_at, step + 1,
        )

    def cond(carry):
        active = carry[7]
        step = carry[-1]
        return jnp.any(active) & (step < config.max_steps)

    # handle immediate-goal seeds: record start as trace[0]
    trace_i = trace_i.at[:, 0, :].set(start_ints)
    trace_f = trace_f.at[:, 0, :].set(start_floats)
    trace_len = jnp.where(start_is_goal, 1, trace_len)
    goal_idx = jnp.where(start_is_goal, 0, goal_idx)
    active = active & ~start_is_goal
    # the start node is also the initial inter goal (reference inits
    # inter_goal_ptr = &starting_node)
    inter_val = jnp.where(
        active,
        start_floats[:, NF_REAL] + _exit_prob(start_ints[:, NI_LEN], dt),
        inter_val,
    )

    if cache_a is None:
        cache_a = jnp.full((2, 8), -1, jnp.int32)
        cache_b = jnp.full((2, 8), -1, jnp.int32)
        cache_val = jnp.full((2, 8), -1, jnp.int32)

    carry = (
        pool_i, pool_f, alive, next_free, trace_i, trace_f, trace_len,
        active, done_partial, goal_idx, inter_idx, inter_val, overflow,
        expansions, cached_entry, cached_at, jnp.zeros((), jnp.int32),
    )
    carry = jax.lax.while_loop(cond, body, carry)
    (
        pool_i, pool_f, alive, next_free, trace_i, trace_f, trace_len,
        active, done_partial, goal_idx, inter_idx, inter_val, overflow,
        expansions, cached_entry, cached_at, steps,
    ) = carry

    return {
        "trace_i": trace_i,
        "trace_f": trace_f,
        "trace_len": trace_len,
        "goal_idx": goal_idx,
        "inter_idx": inter_idx,
        "done_partial": done_partial,
        "overflow": overflow,
        "expansions": expansions,
        "steps": steps,
        "active": active,
        "cached_entry": cached_entry,
        "cached_at": cached_at,
    }
