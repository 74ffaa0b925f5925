"""Pallas kernels vs their numpy reference implementations (interpret mode
on CPU; compiled on real TPU via bench/profile runs)."""

import jax.numpy as jnp
import numpy as np

from megagta_tpu.ops.pallas.step_select import step_select_kill

INT_MIN32 = -(2**31)
IDENT_MASK = (1 << 14) - 1


def _ref_lex(fval, ibx, active):
    """NumPy reference of the a_star_node.h:34-83 pop ordering: max fval,
    then min state_no, then state m > d > i; ties -> lowest index."""
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


def test_step_select_kill_matches_lex_reference():
    rng = np.random.default_rng(5)
    S, P, B, L = 12, 1024, 4, 280  # S not a multiple of the 8-row tile
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

    ia = rng.integers(0, 50_000, (S, P)).astype(np.int32)
    lpx = rng.integers(0, 2**28, (S, P)).astype(np.int32)
    sc = rng.normal(size=(S, P)).astype(np.float32)
    re = rng.normal(size=(S, P)).astype(np.float32)
    mx = rng.normal(size=(S, P)).astype(np.float32)

    (
        fval2, sel, selv, any_alive, is_goal, ia_s, ibx_s,
        lpx_s, sc_s, re_s, mx_s,
    ) = step_select_kill(
        jnp.asarray(fval), jnp.asarray(ia), jnp.asarray(ibx),
        jnp.asarray(lpx), jnp.asarray(sc), jnp.asarray(re), jnp.asarray(mx),
        jnp.asarray(active), B, L, interpret=True,
    )
    ref_idx, ref_any = _ref_lex(fval, ibx, active)
    any_alive = np.asarray(any_alive)
    assert (any_alive == ref_any).all()

    sel = np.asarray(sel)
    selv = np.asarray(selv)
    is_goal = np.asarray(is_goal)
    fval2 = np.asarray(fval2)
    for s in range(S):
        if not ref_any[s] or not active[s]:
            assert not selv[s].any()
            continue
        top = int(ref_idx[s])
        goal = ((int(ibx[s, top]) >> 2) & 0xFFF) >= L
        assert bool(is_goal[s]) == goal
        if goal:
            # goal consumes only slot 0, carrying the goal entry
            assert selv[s, 0] and not selv[s, 1:].any()
            assert sel[s, 0] == top
        else:
            # slot order: exact top-B by fval among non-goal entries
            nk = np.where(
                (((ibx[s] >> 2) & 0xFFF) < L) & (fval[s] != INT_MIN32),
                fval[s], INT_MIN32,
            )
            want = []
            cur = nk.copy()
            for _ in range(B):
                v = cur.max()
                if v == INT_MIN32:
                    break
                i = int(np.flatnonzero(cur == v)[0])
                want.append(i)
                cur[i] = INT_MIN32
            got = [int(x) for x, v in zip(sel[s], selv[s]) if v]
            assert got == want
        # field extraction + closed-kill of every selected identity
        for b in range(B):
            if not selv[s, b]:
                continue
            p = int(sel[s, b])
            assert int(np.asarray(ia_s)[s, b]) == ia[s, p]
            assert int(np.asarray(ibx_s)[s, b]) == ibx[s, p]
            assert int(np.asarray(lpx_s)[s, b]) == lpx[s, p]
            assert float(np.asarray(sc_s)[s, b]) == sc[s, p]
            assert float(np.asarray(re_s)[s, b]) == re[s, p]
            assert float(np.asarray(mx_s)[s, b]) == mx[s, p]
            hit = (ia[s] == ia[s, p]) & (
                (ibx[s] & IDENT_MASK) == (ibx[s, p] & IDENT_MASK)
            )
            assert (fval2[s][hit] == INT_MIN32).all()
