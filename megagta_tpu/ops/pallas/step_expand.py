"""Pallas TPU kernel: fused wavefront-step back half (node expansion).

One kernel computes, for every selected frontier node, all 2W+1 successor
candidates (node_enumerator.h:65-244) — transition/emission scoring against
the profile HMM, weighted-A* priorities, pruning, packed pool fields. The
XLA equivalent was ~30 separate HLO ops each paying the runtime's per-op
overhead; here it is one launch working entirely in VMEM:

  * the per-state scoring row comes from an in-kernel one-hot matmul
    against the fused `hsuper` table (exact: single nonzero term per row)
  * per-path emissions are a 22-way fused select on the amino-acid code

All tensors keep the flat [n = S*B] frontier axis on the SUBLANE dimension
(Mosaic cannot reshape across the lane/sublane boundary); the wrapper does
the [S, B] <-> [n, 1] reshapes in XLA where they are free. The graph path
rows are gathered by XLA before the call (the only op the kernel cannot
beat: a [n]-row gather of pt[node]) and split into the target and flag
planes.

Field layouts match search/wavefront.py v2 (ibx/lpx packing, pt word 1 =
aa_fwd | aa_rev<<5 | ne<<10 | valid<<19 | low<<20).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN32 = -(2**31)
INT_MAX32 = 2**31 - 1
SCALE = 10000.0
HWEIGHT = 2.0
NEG = -1e30

# transition row indices (hmm/profile.py)
MM, MI, MD, IM, II, DM, DD = range(7)


def _make_kernel(W, L, prune_len, low_cov_pen, aa_stop, dt, NT):
    CW = 2 * W + 1

    def kernel(
        scal_ref,  # SMEM [2]: reserved (prefetch slot; currently unused)
        tgt_ref,  # [1, NT, W] i32 path targets
        w1_ref,  # [1, NT, W] i32 path flags/codon word
        ints_ref,  # [1, NT, 8] i32: node, ibx, lpx, emask, dir, parent, 0, 0
        flts_ref,  # [1, NT, 8] dt: score, real, max, 0...
        hsuper_ref,  # [2(L+1) padded, 64] dt
        cf_ref,  # out [1, NT, CW] i32 candidate fval (INT_MIN dead)
        cia_ref,  # out [1, NT, CW] i32 candidate node
        cibx_ref,  # out [1, NT, CW] i32
        clpx_ref,  # out [1, NT, CW] i32
        csc_ref,  # out [1, NT, CW] dt
        cre_ref,  # out [1, NT, CW] dt
        cmx_ref,  # out [1, NT, CW] dt
        cnt_ref,  # out [1, NT, 8] i32: col0 = valid count
    ):
        ints = ints_ref[0]  # [NT, 8]
        node = ints[:, 0:1]
        ibx_s = ints[:, 1:2]
        lpx_s = ints[:, 2:3]
        em = ints[:, 3:4]
        ndir = ints[:, 4:5]
        parent = ints[:, 5:6]
        flts = flts_ref[0]
        score = flts[:, 0:1]
        real = flts[:, 1:2]
        mx = flts[:, 2:3]

        state = ibx_s & 3
        sno = (ibx_s >> 2) & 0xFFF
        neg = (ibx_s >> 14) & 63
        length = lpx_s >> 20

        cur = jnp.minimum(sno, L)
        nxt = jnp.minimum(sno + 1, L)

        n = node.shape[0]
        # fused scoring row: exact one-hot matmul (see DeviceHMM.hsuper)
        HR = hsuper_ref.shape[0]
        comb = ndir * (L + 1) + cur  # [n, 1]
        hit = comb == jax.lax.broadcasted_iota(jnp.int32, (n, HR), 1)
        onehot = jnp.where(hit, jnp.asarray(1.0, dt), jnp.asarray(0.0, dt))
        hrow = jnp.dot(onehot, hsuper_ref[...], preferred_element_type=dt)

        t_mm, t_mi, t_md = hrow[:, 44:45], hrow[:, 45:46], hrow[:, 46:47]
        t_im, t_ii = hrow[:, 47:48], hrow[:, 48:49]
        t_dm, t_dd = hrow[:, 49:50], hrow[:, 50:51]
        mme = hrow[:, 51:52]
        h_m, h_i, h_d = hrow[:, 52:53], hrow[:, 53:54], hrow[:, 54:55]

        negf = jnp.asarray(NEG, dt)
        match_tr = jnp.where(state == 0, t_mm, jnp.where(state == 1, t_im, t_dm))
        ins_tr = jnp.where(state == 0, t_mi, jnp.where(state == 1, t_ii, negf))
        del_tr = jnp.where(state == 0, t_md, jnp.where(state == 1, negf, t_dd))

        # ---- graph paths
        tgt = tgt_ref[0]  # [n, W]
        w1 = w1_ref[0]
        v3 = ((w1 >> 19) & 1) * jnp.where(node >= 0, 1, 0)  # [n, W] int
        low_cov = jnp.where(
            ((w1 >> 20) & 1) != 0,
            jnp.asarray(low_cov_pen, dt),
            jnp.asarray(0.0, dt),
        )
        aa = jnp.where(ndir == 0, w1 & 31, (w1 >> 5) & 31)
        ne_p = (w1 >> 10) & 0x1FF

        # per-path emissions: 22-way fused select on the aa code
        msc = jnp.full((n, W), negf, dt)
        isc = jnp.full((n, W), negf, dt)
        for a_ in range(22):
            sel_a = aa == a_
            msc = jnp.where(sel_a, hrow[:, a_ : a_ + 1], msc)
            isc = jnp.where(sel_a, hrow[:, 22 + a_ : 23 + a_], isc)

        def to_fval(x):
            ok = (x > jnp.asarray(float(INT_MIN32), dt)) & (
                x < jnp.asarray(float(INT_MAX32), dt)
            )
            return jnp.where(ok, x.astype(jnp.int32), INT_MIN32 + 2)

        # ---- match candidates (slots 0..W-1)
        m_real = real + match_tr + msc - low_cov
        m_imp = m_real >= mx
        m_max = jnp.where(m_imp, m_real, mx)
        m_neg = jnp.where(m_imp, 0, neg + 1)
        m_score = score + match_tr + msc - low_cov - mme
        m_fval = to_fval(SCALE * (m_score + HWEIGHT * h_m))
        m_valid = v3 * jnp.where(aa != aa_stop, 1, 0)

        # ---- insert candidates (slots W..2W-1); forbidden from 'd'
        i_real = real + ins_tr + isc - low_cov
        i_score = score + ins_tr + isc - low_cov
        i_fval = to_fval(SCALE * (i_score + HWEIGHT * h_i))
        i_valid = m_valid * jnp.where(state != 2, 1, 0)

        # ---- delete candidate (slot 2W); forbidden from 'i'
        d_real = real + del_tr
        d_score = score + del_tr - mme
        d_fval = to_fval(SCALE * (d_score + HWEIGHT * h_d))
        d_valid = jnp.where((state != 1) & (node >= 0), 1, 0)

        safe_node = jnp.maximum(node, 0)
        cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=1)  # noqa: E731
        bc = lambda x: jnp.broadcast_to(x, (n, W))  # noqa: E731
        cand_node = cat(tgt, tgt, safe_node)
        cand_sno = cat(bc(nxt), bc(sno), nxt)
        cand_state = cat(
            jnp.zeros((n, W), jnp.int32),
            jnp.ones((n, W), jnp.int32),
            jnp.full((n, 1), 2, jnp.int32),
        )
        cand_fval = cat(m_fval, i_fval, d_fval)
        cand_neg = cat(m_neg, bc(neg + 1), neg + 1)
        cand_len = cat(bc(length + 1), bc(length + 1), length)
        dne = (4 << 6) | (4 << 3) | 4
        cand_ne = cat(ne_p, ne_p, jnp.full((n, 1), dne, jnp.int32))
        cand_score = cat(m_score, i_score, d_score)
        cand_real = cat(m_real, i_real, d_real)
        cand_max = cat(m_max, bc(mx), mx)
        valid = cat(m_valid, i_valid, d_valid) * em

        # pruning (hmm_graph_search.h:292-310); a START node's expansion is
        # unpruned (hmm_graph_search.h:217-234). Roots are identified per
        # node by a zero parent field (only start entries carry parent -1,
        # so lpx bits 0-19 == 0 <=> start) — under seed refill, starts
        # appear at arbitrary steps, not just step 0
        if prune_len > 0:
            keep = jnp.where(
                ((cand_len < 5) | (cand_neg <= prune_len)) & (cand_real > 0.0),
                1,
                0,
            )
            root = jnp.where((lpx_s & 0xFFFFF) == 0, 1, 0)  # [n, 1]
            keep = keep | jnp.broadcast_to(root, keep.shape)
            valid = valid * keep

        c_ibx = (
            cand_state
            | (cand_sno << 2)
            | (jnp.minimum(cand_neg, 63) << 14)
            | (cand_ne << 20)
        )
        c_lpx = (jnp.broadcast_to(parent, (n, CW)) + 1) | (
            jnp.minimum(cand_len, 2047) << 20
        )
        cf_ref[0] = jnp.where(
            valid != 0, jnp.maximum(cand_fval, INT_MIN32 + 2), INT_MIN32
        )
        cia_ref[0] = cand_node
        cibx_ref[0] = c_ibx
        clpx_ref[0] = c_lpx
        csc_ref[0] = cand_score
        cre_ref[0] = cand_real
        cmx_ref[0] = cand_max
        cnt = jnp.sum(valid, axis=1, keepdims=True)
        cnt_ref[0] = jnp.concatenate(
            [cnt, jnp.zeros((n, 7), jnp.int32)], axis=1
        )

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "W", "L", "prune_len", "low_cov_pen", "aa_stop", "interpret",
    ),
)
def step_expand(
    pt_rows,  # [n, W, 2] i32 gathered graph rows (n = S*B)
    hsuper,  # [2(L+1), 64] dt
    node, ibx_s, lpx_s,  # [n] i32
    score, real, mx,  # [n] dt
    expand_mask,  # [n] bool
    ndir,  # [n] i32
    parent,  # [n] i32 trace position of the source node
    W: int, L: int,
    prune_len: int, low_cov_pen: float, aa_stop: int,
    interpret: bool = False,
):
    """Fused expansion over the flat frontier. Returns
    (c_fval, c_ia, c_ibx, c_lpx [n, CW] i32, c_sc, c_re, c_mx [n, CW] dt,
    counts [n] i32)."""
    n = node.shape[0]
    dt = score.dtype
    CW = 2 * W + 1
    # NT caps the per-program tile: narrow [NT, 1]/[NT, W] intermediates are
    # lane-padded to 128 in VMEM, so a large tile OOMs scoped vmem
    NT = next(t for t in (256, 128, 64, 32, 16, 8) if n % t == 0)
    G = n // NT
    HR = hsuper.shape[0]
    if HR % 8:
        hsuper = jnp.pad(hsuper, ((0, 8 - HR % 8), (0, 0)))

    scal = jnp.zeros((2,), jnp.int32)  # reserved prefetch slot
    zi = jnp.zeros((n, 2), jnp.int32)
    ints = jnp.stack(
        [
            node, ibx_s, lpx_s,
            expand_mask.astype(jnp.int32), ndir.astype(jnp.int32), parent,
        ],
        axis=1,
    )
    ints = jnp.concatenate([ints, zi], axis=1).reshape(G, NT, 8)
    flts = jnp.stack(
        [score, real, mx, jnp.zeros((n,), dt)], axis=1
    )
    flts = jnp.concatenate(
        [flts, jnp.zeros((n, 4), dt)], axis=1
    ).reshape(G, NT, 8)

    vspec = lambda c: pl.BlockSpec(  # noqa: E731
        (1, NT, c), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            vspec(W), vspec(W), vspec(8), vspec(8),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hsuper, whole
        ],
        out_specs=tuple([vspec(CW)] * 7 + [vspec(8)]),
    )
    out = pl.pallas_call(
        _make_kernel(W, L, prune_len, float(low_cov_pen), aa_stop, dt, NT),
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((G, NT, CW), jnp.int32)] * 4
            + [jax.ShapeDtypeStruct((G, NT, CW), dt)] * 3
            + [jax.ShapeDtypeStruct((G, NT, 8), jnp.int32)]
        ),
        interpret=interpret,
    )(
        scal,
        pt_rows[:, :, 0].reshape(G, NT, W),
        pt_rows[:, :, 1].reshape(G, NT, W),
        ints, flts, hsuper,
    )
    r = lambda a: a.reshape(n, CW)  # noqa: E731
    return (
        r(out[0]), r(out[1]), r(out[2]), r(out[3]),
        r(out[4]), r(out[5]), r(out[6]),
        out[7].reshape(n, 8)[:, 0],
    )
