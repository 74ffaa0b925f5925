"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; compiled on real TPU via bench/profile runs)."""

import jax.numpy as jnp
import numpy as np

from megagta_tpu.ops.pallas.pool_select import INT_MIN32, pool_select


def _ref_lex(fval, ibx, active):
    """NumPy reference of wavefront.select_lex's ordering: max fval, then
    min state_no, then state m > d > i; ties -> lowest index."""
    S, P = fval.shape
    idx = np.zeros(S, np.int64)
    anyv = np.zeros(S, bool)
    rank = {0: 3, 1: 1, 2: 2}
    for s in range(S):
        if not active[s]:
            continue
        best = None
        for p in range(P):
            if fval[s, p] == INT_MIN32:
                continue
            sno = (int(ibx[s, p]) >> 2) & 0xFFF
            st = int(ibx[s, p]) & 3
            key = (int(fval[s, p]), -sno, rank[st])
            if best is None or key > best[0]:
                best = (key, p)
        if best is not None:
            anyv[s] = True
            idx[s] = best[1]
    return idx, anyv


def test_pool_select_matches_lex_reference():
    rng = np.random.default_rng(5)
    S, P = 12, 1024  # S not a multiple of the kernel's 8-row tile
    fval = rng.integers(-(2**20), 2**20, (S, P)).astype(np.int32)
    sno = rng.integers(0, 300, (S, P)).astype(np.int32)
    st = rng.integers(0, 3, (S, P)).astype(np.int32)
    ibx = (st | (sno << 2)).astype(np.int32)
    dead = rng.random((S, P)) > 0.5
    fval[dead] = INT_MIN32
    active = np.ones(S, bool)
    active[3] = False  # one inactive row
    fval[4] = INT_MIN32  # one empty pool

    # force fval ties to exercise the k2 tie-break
    fval[0, :] = 7
    fval[1, ::2] = 9
    fval[1, 1::2] = 9

    idx, any_alive = pool_select(
        jnp.asarray(fval), jnp.asarray(ibx), jnp.asarray(active), interpret=True
    )
    ref_idx, ref_any = _ref_lex(fval, ibx, active)
    assert (np.asarray(any_alive) == ref_any).all()
    ok = np.asarray(any_alive)
    assert (np.asarray(idx)[ok] == ref_idx[ok]).all()
