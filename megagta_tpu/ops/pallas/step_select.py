"""Pallas TPU kernel: fused wavefront-step front half.

One streaming VMEM pass over the pool planes replaces the XLA chain that
dominated the per-step cost (each [S, P]-shaped op pays its own HBM pass,
and take_along_axis gathers serialize on TPU):

  select_lex (exact lexicographic top-1, a_star_node.h:34-83 ordering)
  + select top-B frontier by fval among non-goal entries (exact, iterative)
  + goal detection and goal-consumes-slot-0 override
  + extraction of every selected entry's 7 pool fields (masked reductions,
    no gathers)
  + closed-kill: fval := INT_MIN for every entry matching an expanded
    identity (hmm_graph_search.h:294-331 dedup semantics)

Grid = tiles of ROWS seeds; in/out fval is aliased so the kill is in-place.
Field layout matches search/wavefront.py v2 (ibx bits 0-1 state, 2-13
state_no; IDENT_MASK selects the identity bits).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN32 = -(2**31)
IDENT_MASK = (1 << 14) - 1

def _rows_for(P: int, S: int) -> int:
    """Seed rows per program. Measured on v5e at [S=1024, P=4096]: 8 rows
    beat 32 (2.5 s vs 1.4 s bench wall) — the kernel is VMEM-traffic-bound,
    not launch-bound, so fatter programs only add pressure."""
    del P, S
    return 8


def _make_kernel(B: int, L: int):
    # small outputs are packed into 128-lane planes (TPU tiling requires the
    # last block dim to be 128 or the full array dim): outi1 = sel | selv<<32
    # ... -> cols [0:32) sel, [32:64) selv, [64:96) ia_s, [96:128) ibx_s;
    # outi2 = [0:32) lpx_s, col 32 any_alive, col 33 is_goal;
    # outf  = [0:32) sc_s, [32:64) re_s, [64:96) mx_s.
    def kernel(
        fval_ref, resti_ref, poolf_ref, act_ref,
        fval_out, outi1_ref, outi2_ref, outf_ref,
    ):
        # NOTE masks stay int32 throughout: Mosaic rejects select_n with
        # i1-typed OPERANDS ("unsupported target bitwidth for truncation"),
        # so booleans appear only as where() conditions. The grouped planes
        # arrive lane-flattened ([ROWS, 3P]) — rank-4 blocks with a tiny
        # sublane dim stall the Mosaic compiler.
        f = fval_ref[0]  # [ROWS, P]
        P = f.shape[1]
        ibx = resti_ref[0][:, P : 2 * P]
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

        # ---- field extraction + kill masks, one pass per selected slot
        ia = resti_ref[0][:, 0:P]
        lpx = resti_ref[0][:, 2 * P : 3 * P]
        sc = poolf_ref[0][:, 0:P]
        re = poolf_ref[0][:, P : 2 * P]
        mx = poolf_ref[0][:, 2 * P : 3 * P]
        dead = jnp.zeros(f.shape, jnp.int32)
        ia_s = []
        ibx_s = []
        lpx_s = []
        sc_s = []
        re_s = []
        mx_s = []
        neg_f = jnp.asarray(float(np.finfo(np.float32).min), sc.dtype)
        for b in range(B):
            pos = cols == sel[:, b][:, None]  # [ROWS, P] one-hot

            def ext(arr, zero):
                return jnp.max(jnp.where(pos, arr, zero), axis=1)

            ia_b = ext(ia, INT_MIN32)
            ibx_b = ext(ibx, INT_MIN32)
            ia_s.append(ia_b)
            ibx_s.append(ibx_b)
            lpx_s.append(ext(lpx, INT_MIN32))
            sc_s.append(ext(sc, neg_f))
            re_s.append(ext(re, neg_f))
            mx_s.append(ext(mx, neg_f))
            hit = (
                (ia == ia_b[:, None])
                & ((ibx & IDENT_MASK) == (ibx_b[:, None] & IDENT_MASK))
                & (selv[:, b][:, None] != 0)
            )
            dead = dead | jnp.where(hit, 1, 0)

        R = f.shape[0]
        pad = lambda a: jnp.pad(jnp.stack(a, axis=1), ((0, 0), (0, 32 - B)))  # noqa: E731
        outi1_ref[0] = jnp.concatenate(
            [
                pad([sel[:, b] for b in range(B)]),
                pad([selv[:, b] for b in range(B)]),
                pad(ia_s),
                pad(ibx_s),
            ],
            axis=1,
        )
        outi2_ref[0] = jnp.concatenate(
            [pad(lpx_s), any_i, goal_i, jnp.zeros((R, 94), jnp.int32)],
            axis=1,
        )
        outf_ref[0] = jnp.concatenate(
            [pad(sc_s), pad(re_s), pad(mx_s), jnp.zeros((R, 32), sc.dtype)],
            axis=1,
        )

        fval_out[0] = jnp.where(dead != 0, INT_MIN32, f)

    return kernel


@partial(jax.jit, static_argnames=("B", "L", "interpret"))
def step_select_kill(fval, resti, poolf, active,
                     B: int, L: int, interpret: bool = False):
    """Fused select + extract + kill over the grouped pool planes
    (fval [S,P]; resti [S,3,P] = ia/ibx/lpx; poolf [S,3,P] = sc/re/mx).
    Returns (fval', sel [S,B], selv [S,B] bool, any_alive [S] bool,
    is_goal [S] bool, ia_s, ibx_s, lpx_s [S,B] i32, sc_s, re_s, mx_s
    [S,B] dt)."""
    S, P = fval.shape
    dt = poolf.dtype
    assert B <= 32, "packed output lanes allow at most 32 frontier slots"
    ROWS = _rows_for(P, S)
    pad = (-S) % ROWS
    if pad:
        fval = jnp.pad(fval, ((0, pad), (0, 0)), constant_values=INT_MIN32)
        resti = jnp.pad(resti, ((0, pad), (0, 0), (0, 0)))
        poolf = jnp.pad(poolf, ((0, pad), (0, 0), (0, 0)))
        active = jnp.pad(active, (0, pad))
    Sp = S + pad
    G = Sp // ROWS
    act = active.astype(jnp.int32).reshape(G, ROWS, 1)

    spec = pl.BlockSpec((1, ROWS, P), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((1, ROWS, 3 * P), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, ROWS, 1), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, ROWS, 128), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)

    fval2, outi1, outi2, outf = pl.pallas_call(
        _make_kernel(B, L),
        grid=(G,),
        in_specs=[spec, spec3, spec3, aspec],
        out_specs=(spec, ospec, ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((G, ROWS, P), jnp.int32),
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, ROWS, 128), dt),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(
        fval.reshape(G, ROWS, P),
        resti.reshape(G, ROWS, 3 * P),
        poolf.reshape(G, ROWS, 3 * P),
        act,
    )

    i1 = outi1.reshape(Sp, 128)[:S]
    i2 = outi2.reshape(Sp, 128)[:S]
    of = outf.reshape(Sp, 128)[:S]
    return (
        fval2.reshape(Sp, P)[:S],
        i1[:, 0:B], i1[:, 32 : 32 + B] != 0,
        i2[:, 32] != 0, i2[:, 33] != 0,
        i1[:, 64 : 64 + B], i1[:, 96 : 96 + B], i2[:, 0:B],
        of[:, 0:B], of[:, 32 : 32 + B], of[:, 64 : 64 + B],
    )
