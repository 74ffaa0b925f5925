"""Pallas TPU kernel: fused priority-key computation + lexicographic argmax
over the wavefront pool.

One VMEM pass replaces the XLA chain (two key computations, four masked
reductions, one argmax) that scans the [S, P] pool every search step
(search/wavefront.py::_priority_keys/_argmax_lex — the reference's
priority-queue top() in a_star_node.h:34-83). Grid = seeds; each program
reduces its seed's pool tile-by-tile in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN32 = -(2**31)

# field indices (keep in sync with search/wavefront.py)
NI_STATE_NO, NI_STATE, NI_FVAL = 1, 2, 3


def _kernel(fval_ref, sno_ref, st_ref, alive_ref, idx_ref, any_ref):
    k1 = fval_ref[...]  # [R, 128]
    sno = sno_ref[...]
    st = st_ref[...]
    msk = alive_ref[...] != 0

    # state rank m=3, d=2, i=1 (state codes 0,1,2)
    rank = jnp.where(st == 0, 3, jnp.where(st == 2, 2, 1))
    k2 = ((32767 - sno) << 4) | rank

    k1m = jnp.where(msk, k1, INT_MIN32)
    b1 = jnp.max(k1m)
    tie = (k1m == b1) & msk
    k2m = jnp.where(tie, k2, INT_MIN32)
    b2 = jnp.max(k2m)
    cand = tie & (k2m == b2)

    R, C = k1.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    flat = rows * C + cols
    idx = jnp.min(jnp.where(cand, flat, R * C))
    idx_ref[0] = jnp.where(jnp.any(msk), idx, 0)
    any_ref[0] = jnp.any(msk).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def pool_select(pool_i: jnp.ndarray, alive: jnp.ndarray, interpret: bool = False):
    """(best index [S], any_alive [S]) for [S, P, 8] int32 pools."""
    S, P, _ = pool_i.shape
    R = P // 128
    fval = pool_i[..., NI_FVAL].reshape(S, R, 128)
    sno = pool_i[..., NI_STATE_NO].reshape(S, R, 128)
    st = pool_i[..., NI_STATE].reshape(S, R, 128)
    al = alive.astype(jnp.int32).reshape(S, R, 128)

    spec = pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda f, n, t, a, i, y: _kernel(f[0], n[0], t[0], a[0], i, y),
        grid=(S,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(
            pl.BlockSpec((1,), lambda s: (s,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda s: (s,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S,), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
        ),
        interpret=interpret,
    )(fval, sno, st, al)
    return out[0], out[1] != 0
