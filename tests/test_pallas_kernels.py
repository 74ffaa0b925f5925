"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; compiled on real TPU via bench/profile runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from megagta_tpu.ops.pallas.pool_select import pool_select
from megagta_tpu.search.wavefront import (
    NI_FVAL,
    NI_STATE,
    NI_STATE_NO,
    _argmax_lex,
    _priority_keys,
)


def test_pool_select_matches_argmax_lex():
    rng = np.random.default_rng(5)
    S, P = 8, 1024
    pool = np.zeros((S, P, 8), np.int32)
    pool[..., NI_FVAL] = rng.integers(-(2**20), 2**20, (S, P))
    pool[..., NI_STATE_NO] = rng.integers(0, 300, (S, P))
    pool[..., NI_STATE] = rng.integers(0, 3, (S, P))
    alive = rng.random((S, P)) > 0.5
    alive[3] = False  # one empty pool

    # force fval ties to exercise the k2 tie-break
    pool[0, :, NI_FVAL] = 7
    pool[1, ::2, NI_FVAL] = 9
    pool[1, 1::2, NI_FVAL] = 9

    pi = jnp.asarray(pool)
    al = jnp.asarray(alive)
    idx, any_alive = pool_select(pi, al, interpret=True)
    k1, k2 = _priority_keys(pi)
    ref_idx, ref_any = _argmax_lex(k1, k2, al)
    assert (np.asarray(any_alive) == np.asarray(ref_any)).all()
    ok = np.asarray(any_alive)
    assert (np.asarray(idx)[ok] == np.asarray(ref_idx)[ok]).all()
