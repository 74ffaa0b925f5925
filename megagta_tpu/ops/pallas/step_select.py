"""Pallas TPU kernel: fused wavefront-step front half.

One streaming VMEM pass over the pool planes replaces the XLA chain that
dominated the per-step cost (each [S, P]-shaped op pays its own HBM pass,
and take_along_axis gathers serialize on TPU):

  select_lex (exact lexicographic top-1, a_star_node.h:34-83 ordering)
  + select top-B frontier by fval among non-goal entries (exact, iterative)
  + goal detection and goal-consumes-slot-0 override
  + closed-kill: fval := INT_MIN for every entry matching an expanded
    identity (hmm_graph_search.h:294-331 dedup semantics)
  + extraction of ALL seven pool fields of the B selected entries
    (ia/ibx fall out of the kill compare; lpx and the three score planes
    are extracted with the same one-hot max trick — an xprof of the v2
    caller showed the four [S, B] take_along_axis gathers costing ~0.38
    ms/step at [1024, 4096], MORE than this kernel's whole streaming pass,
    so they now ride the kernel where the planes are already in VMEM).

Grid = tiles of ROWS seeds; in/out fval is aliased so the kill is in-place.
Field layout matches search/wavefront.py (ibx bits 0-1 state, 2-13
state_no; IDENT_MASK selects the identity bits).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN32 = -(2**31)
IDENT_MASK = (1 << 14) - 1

def select_fits(P: int) -> bool:
    """True when even a single-row tile of the pool planes fits the ~4 MB
    scoped-VMEM budget; callers must take the XLA select path otherwise
    (pool widths >~ 116k lanes)."""
    return P * 36 <= (4 << 20)


def _rows_for(P: int, S: int) -> int:
    """Seed rows per program, sized so the streamed block (7 input planes +
    1 output plane + small outputs, double-buffered) stays inside scoped
    VMEM: ROWS x P x 4 B x 9 <= ~4 MB. The kernel's true stack is ~2.2x
    the plane bytes once Mosaic materializes the body temporaries
    (fm/k2m/nk/dead) against a 16 MB scoped-vmem limit: 64-row tiles need
    20.5 MB and never compile; 32-row tiles measured 16.67 MB in some
    surrounding-program contexts (metagenome-scale graphs) and are too
    marginal, despite being ~15% faster when they fit. 16-row tiles
    (2.3 MB planes) compile everywhere. Big-pool ladder configs (the
    deep / exact escalation shapes, P up to 128k) drop to narrow row
    tiles."""
    assert select_fits(P), (
        f"pool width {P} exceeds the Pallas select kernel's VMEM budget "
        "even at one row per program; use the XLA select path"
    )
    rows = 64
    while rows > 1 and rows * P * 36 > (4 << 20):
        rows //= 2
    while rows > 1 and S % rows:
        rows //= 2
    return rows


def _make_kernel(B: int, L: int):
    # small int outputs ride one 256-lane plane: cols [0:32) sel, [32:64)
    # selv, [64:96) ia_s, [96:128) ibx_s, col 128 any_alive, col 129
    # is_goal, [160:192) lpx_s. Float outputs ride a 128-lane plane:
    # [0:32) sc, [32:64) re, [64:96) mx.
    def kernel(fval_ref, ia_ref, ibx_ref, lpx_ref, sc_ref, re_ref, mx_ref,
               act_ref, fval_out, outi_ref, outf_ref):
        # NOTE masks stay int32 throughout: Mosaic rejects select_n with
        # i1-typed OPERANDS ("unsupported target bitwidth for truncation"),
        # so booleans appear only as where() conditions.
        f = fval_ref[0]  # [ROWS, P]
        P = f.shape[1]
        ia = ia_ref[0]
        ibx = ibx_ref[0]
        act_i = act_ref[0]  # [ROWS, 1] int32 0/1
        cols = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)

        fm = jnp.where(act_i != 0, f, INT_MIN32)
        # ---- exact lex top-1
        best1 = jnp.max(fm, axis=1, keepdims=True)  # [ROWS, 1]
        sno = (ibx >> 2) & 0xFFF
        st = ibx & 3
        rank = jnp.where(st == 0, 3, jnp.where(st == 2, 2, 1))
        k2 = ((4095 - sno) << 2) | rank
        k2m = jnp.where(fm == best1, k2, INT_MIN32)
        best2 = jnp.max(k2m, axis=1, keepdims=True)
        sel1 = jnp.min(
            jnp.where((fm == best1) & (k2m == best2), cols, P), axis=1
        )  # [ROWS]
        any_i = jnp.where(best1 > INT_MIN32, 1, 0)  # [ROWS, 1]

        # is_goal: state_no at sel1 >= L (only meaningful when any_alive)
        sno1 = jnp.max(
            jnp.where(cols == sel1[:, None], sno, 0), axis=1, keepdims=True
        )
        goal_i = jnp.where(
            (any_i != 0) & (act_i != 0) & (sno1 >= L), 1, 0
        )  # [ROWS, 1]

        # ---- exact top-B among non-goal entries (iterative argmax)
        sels = []
        vals = []
        nk = jnp.where((act_i != 0) & (sno < L), f, INT_MIN32)
        for _ in range(B):
            v = jnp.max(nk, axis=1)
            i = jnp.min(jnp.where(nk == v[:, None], cols, P), axis=1)
            sels.append(jnp.where(v > INT_MIN32, i, 0))
            vals.append(v)
            nk = jnp.where(cols == i[:, None], INT_MIN32, nk)

        sel = jnp.stack(sels, axis=1)  # [ROWS, B]
        topv = jnp.stack(vals, axis=1)
        selv = jnp.where(topv > INT_MIN32, 1, 0) * act_i
        if B == 1:
            sel = sel1[:, None]
            selv = any_i * act_i
        else:
            # goal consumes only slot 0 (carrying the goal node)
            slot0 = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1) == 0, 1, 0
            )
            sel = jnp.where((goal_i * slot0) != 0, sel1[:, None], sel)
            selv = jnp.where(goal_i != 0, slot0, selv) * act_i

        # ---- payload extraction + kill masks, one pass per selected slot
        lpx = lpx_ref[0]
        sc = sc_ref[0]
        re = re_ref[0]
        mx = mx_ref[0]
        ninf = jnp.asarray(-jnp.inf, sc.dtype)
        dead = jnp.zeros(f.shape, jnp.int32)
        ia_s, ibx_s, lpx_s, sc_s, re_s, mx_s = [], [], [], [], [], []
        for b in range(B):
            pos = cols == sel[:, b][:, None]  # [ROWS, P] one-hot
            ia_b = jnp.max(jnp.where(pos, ia, INT_MIN32), axis=1)
            ibx_b = jnp.max(jnp.where(pos, ibx, INT_MIN32), axis=1)
            ia_s.append(ia_b)
            ibx_s.append(ibx_b)
            lpx_s.append(jnp.max(jnp.where(pos, lpx, INT_MIN32), axis=1))
            sc_s.append(jnp.max(jnp.where(pos, sc, ninf), axis=1))
            re_s.append(jnp.max(jnp.where(pos, re, ninf), axis=1))
            mx_s.append(jnp.max(jnp.where(pos, mx, ninf), axis=1))
            hit = (
                (ia == ia_b[:, None])
                & ((ibx & IDENT_MASK) == (ibx_b[:, None] & IDENT_MASK))
                & (selv[:, b][:, None] != 0)
            )
            dead = dead | jnp.where(hit, 1, 0)

        R = f.shape[0]
        pad = lambda a: jnp.pad(jnp.stack(a, axis=1), ((0, 0), (0, 32 - B)))  # noqa: E731
        outi_ref[0] = jnp.concatenate(
            [
                pad([sel[:, b] for b in range(B)]),
                pad([selv[:, b] for b in range(B)]),
                pad(ia_s),
                pad(ibx_s),
                any_i,
                goal_i,
                jnp.zeros((R, 30), jnp.int32),
                pad(lpx_s),
                jnp.zeros((R, 64), jnp.int32),
            ],
            axis=1,
        )
        outf_ref[0] = jnp.concatenate(
            [pad(sc_s), pad(re_s), pad(mx_s), jnp.zeros((R, 32), sc.dtype)],
            axis=1,
        )

        fval_out[0] = jnp.where(dead != 0, INT_MIN32, f)

    return kernel


@partial(jax.jit, static_argnames=("B", "L", "interpret"))
def step_select_kill(fval, ia, ibx, lpx, sc, re, mx, active,
                     B: int, L: int, interpret: bool = False):
    """Fused select + kill + payload extraction over the pool planes.
    Returns (fval', sel [S,B] i32, selv [S,B] bool, any_alive [S] bool,
    is_goal [S] bool, ia_s, ibx_s, lpx_s [S,B] i32, sc_s, re_s, mx_s
    [S,B] float)."""
    S, P = fval.shape
    assert B <= 32, "packed output lanes allow at most 32 frontier slots"
    ROWS = _rows_for(P, S)
    pad = (-S) % ROWS
    if pad:
        fval = jnp.pad(fval, ((0, pad), (0, 0)), constant_values=INT_MIN32)
        ia = jnp.pad(ia, ((0, pad), (0, 0)))
        ibx = jnp.pad(ibx, ((0, pad), (0, 0)))
        lpx = jnp.pad(lpx, ((0, pad), (0, 0)))
        sc = jnp.pad(sc, ((0, pad), (0, 0)))
        re = jnp.pad(re, ((0, pad), (0, 0)))
        mx = jnp.pad(mx, ((0, pad), (0, 0)))
        active = jnp.pad(active, (0, pad))
    Sp = S + pad
    G = Sp // ROWS
    act = active.astype(jnp.int32).reshape(G, ROWS, 1)
    ft = sc.dtype

    spec = pl.BlockSpec((1, ROWS, P), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, ROWS, 1), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, ROWS, 256), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, ROWS, 128), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)

    fval2, outi, outf = pl.pallas_call(
        _make_kernel(B, L),
        grid=(G,),
        in_specs=[spec, spec, spec, spec, spec, spec, spec, aspec],
        out_specs=(spec, ospec, fspec),
        out_shape=(
            jax.ShapeDtypeStruct((G, ROWS, P), jnp.int32),
            jax.ShapeDtypeStruct((G, ROWS, 256), jnp.int32),
            jax.ShapeDtypeStruct((G, ROWS, 128), ft),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(
        fval.reshape(G, ROWS, P),
        ia.reshape(G, ROWS, P),
        ibx.reshape(G, ROWS, P),
        lpx.reshape(G, ROWS, P),
        sc.reshape(G, ROWS, P),
        re.reshape(G, ROWS, P),
        mx.reshape(G, ROWS, P),
        act,
    )

    i1 = outi.reshape(Sp, 256)[:S]
    f1 = outf.reshape(Sp, 128)[:S]
    return (
        fval2.reshape(Sp, P)[:S],
        i1[:, 0:B], i1[:, 32 : 32 + B] != 0,
        i1[:, 128] != 0, i1[:, 129] != 0,
        i1[:, 64 : 64 + B], i1[:, 96 : 96 + B],
        i1[:, 160 : 160 + B],
        f1[:, 0:B], f1[:, 32 : 32 + B], f1[:, 64 : 64 + B],
    )
