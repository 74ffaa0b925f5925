"""Pallas TPU kernel: fused lexicographic pool-selection.

One VMEM pass over (fval, ibx) replaces the XLA chain (blockwise maxima,
tie filters, argmaxes) that scans the [S, P] pool every search step
(search/wavefront.py::select_lex — the reference's priority-queue top() in
a_star_node.h:34-83). Grid = seed tiles; each program reduces a tile of
seeds' pools in VMEM.

Field layout matches search/wavefront.py v2: `fval` [S, P] int32 with
INT_MIN marking dead/empty slots and rows masked by `active`; `ibx` packs
state (bits 0-1) and state_no (bits 2-13); the lexicographic order is
(max fval, min state_no, state m > d > i), ties -> lowest index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN32 = -(2**31)

ROWS = 8  # seed rows per program (sublane tile height)


def _kernel(fval_ref, ibx_ref, act_ref, idx_ref, any_ref):
    f = fval_ref[0]  # [ROWS, P]
    ibx = ibx_ref[0]
    act = act_ref[0] != 0  # [ROWS, 1]

    fm = jnp.where(act, f, INT_MIN32)
    best1 = jnp.max(fm, axis=1, keepdims=True)  # [ROWS, 1]

    sno = (ibx >> 2) & 0xFFF
    st = ibx & 3
    rank = jnp.where(st == 0, 3, jnp.where(st == 2, 2, 1))
    k2 = ((4095 - sno) << 2) | rank
    tie = fm == best1
    k2m = jnp.where(tie, k2, INT_MIN32)
    best2 = jnp.max(k2m, axis=1, keepdims=True)

    cand = tie & (k2m == best2)
    P = f.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    idx = jnp.min(jnp.where(cand, cols, P), axis=1)
    alive = best1[:, 0] > INT_MIN32
    idx_ref[0] = jnp.where(alive, idx, 0)
    any_ref[0] = alive.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def pool_select(fval: jnp.ndarray, ibx: jnp.ndarray, active: jnp.ndarray,
                interpret: bool = False):
    """(lex argmax index [S], any_alive [S]) over per-seed pools.

    fval/ibx: [S, P] int32; active: [S] bool (inactive rows -> any=False).
    """
    S, P = fval.shape
    pad = (-S) % ROWS
    if pad:
        fval = jnp.pad(fval, ((0, pad), (0, 0)), constant_values=INT_MIN32)
        ibx = jnp.pad(ibx, ((0, pad), (0, 0)))
        active = jnp.pad(active, (0, pad))
    Sp = S + pad
    act = active.astype(jnp.int32).reshape(Sp, 1)

    spec = pl.BlockSpec((1, ROWS, P), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, ROWS, 1), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    idx, anyv = pl.pallas_call(
        _kernel,
        grid=(Sp // ROWS,),
        in_specs=[spec, spec, aspec],
        out_specs=(
            pl.BlockSpec((1, ROWS), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp // ROWS, ROWS), jnp.int32),
            jax.ShapeDtypeStruct((Sp // ROWS, ROWS), jnp.int32),
        ),
        interpret=interpret,
    )(
        fval.reshape(Sp // ROWS, ROWS, P),
        ibx.reshape(Sp // ROWS, ROWS, P),
        act.reshape(Sp // ROWS, ROWS, 1),
    )
    return idx.reshape(Sp)[:S], anyv.reshape(Sp)[:S] != 0
