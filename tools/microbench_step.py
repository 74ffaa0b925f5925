"""Design microbenchmarks for the wavefront-step rewrite.

Measures, at production shapes, the primitives the v2 step design needs:
separate-field selection, kill-compare on dedicated identity arrays,
scatter kill, 2-op compact sort + payload gather, while_loop carry
overhead with/without lax.cond on large state, fori inner loop.

Usage: python tools/microbench_step.py [S] [P] [B]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

from megagta_tpu.utils.jaxconfig import setup_jax

setup_jax()
import jax
import jax.numpy as jnp

S = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
P = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ITERS = int(os.environ.get("ITERS", "200"))
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{name:44s} {1000*dt/ITERS:8.3f} ms/step", flush=True)


def loop(body):
    return lambda x: jax.lax.fori_loop(0, ITERS, body, x)


fval = jax.random.randint(key, (S, P), -100, 1 << 30, jnp.int32)
ia = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
ib = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
sel = jax.random.randint(key, (S, B), 0, P, jnp.int32)

# 1. hierarchical exact top-B: blockmax -> top-B blocks -> top-B entries
BL = 128
NB = P // BL


def hier_body(i, fv):
    blk = fv.reshape(S, NB, BL)
    bm = blk.max(axis=-1)  # [S, NB]
    _, bidx = jax.lax.top_k(bm, B)  # [S, B] exact small top-k
    cand = jnp.take_along_axis(blk, bidx[..., None], axis=1).reshape(S, B * BL)
    v, ci = jax.lax.top_k(cand, B)
    flat = bidx[..., None] * BL + 0  # placeholder to keep deps
    return fv.at[:, 0].set(v[:, 0] + i + flat[:, 0, 0])


timeit("hier exact top-B (blockmax+2x top_k)", loop(hier_body), fval)


# 2. kill: broadcast compare on separate ident arrays, rewrite fval
def kill_body(i, fv):
    sa = jnp.take_along_axis(ia, sel, axis=1)
    sb = jnp.take_along_axis(ib, sel, axis=1)
    same = ((ia[:, :, None] == sa[:, None, :]) & (ib[:, :, None] == sb[:, None, :])).any(-1)
    return jnp.where(same, jnp.int32(-(2**31)), fv + i * 0)


timeit("kill compare (sep ident) + fval rewrite", loop(kill_body), fval)


# 3. scatter kill [S, B] -> [S, P]
def scat_body(i, fv):
    return fv.at[jnp.arange(S)[:, None], (sel + i) % P].set(-(2**31))


timeit("scatter kill [S,B]", loop(scat_body), fval)

# 4. 2-op compact sort + payload row gather
meta = jax.random.randint(key, (S, P, 4), 0, 1 << 20, jnp.int32)
scores = jax.random.normal(key, (S, P, 3), jnp.float32)


def compact2_body(i, state):
    fv, meta, scores = state
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (S, P))
    k, perm = jax.lax.sort((-fv, idx), dimension=1, num_keys=1, is_stable=True)
    m = jnp.take_along_axis(meta, perm[..., None], axis=1)
    sc = jnp.take_along_axis(scores, perm[..., None], axis=1)
    return (-k, m, sc)


timeit("compact: 2-op sort + payload gather", loop(compact2_body), (fval, meta, scores))


# 5. while_loop carry overhead: big buffers + trivial DUS, no cond
T = 2048 * B + 1
trace = jnp.zeros((S, T // 4, 8), jnp.int32)
blk8 = jnp.ones((S, B, 8), jnp.int32)
cand_blk = jnp.ones((S, 2 * B * 16), jnp.int32)


def carry_nocond(state):
    def body(c):
        fv, tr, step = c
        fv = jax.lax.dynamic_update_slice(fv, cand_blk, (0, step % (P - cand_blk.shape[1])))
        tr = jax.lax.dynamic_update_slice(tr, blk8, (0, step % (T // 4 - B), 0))
        return fv, tr, step + 1

    def cond(c):
        return c[2] < ITERS

    return jax.lax.while_loop(cond, body, (state[0], state[1], 0))


timeit("while carry: fval+trace DUS only", carry_nocond, (fval, trace))


# 6. same + lax.cond(identity vs sort-compact) on the big state
def carry_cond(state):
    def compact(s):
        fv, tr = s
        k = jax.lax.sort((-fv,), dimension=1, num_keys=1)[0]
        return -k, tr

    def body(c):
        fv, tr, step = c
        fv = jax.lax.dynamic_update_slice(fv, cand_blk, (0, step % (P - cand_blk.shape[1])))
        tr = jax.lax.dynamic_update_slice(tr, blk8, (0, step % (T // 4 - B), 0))
        fv, tr = jax.lax.cond(step == ITERS + 5, compact, lambda s: s, (fv, tr))
        return fv, tr, step + 1

    def cond(c):
        return c[2] < ITERS

    return jax.lax.while_loop(cond, body, (state[0], state[1], 0))


timeit("while carry + never-taken cond(sort)", carry_cond, (fval, trace))


# 7. elementwise 2D gather cost: hash-table probe shape [S, CAND] into [S, H]
H = 1 << 12
tab = jax.random.randint(key, (S, H), 0, 5, jnp.int32)
probe = jax.random.randint(key, (S, 2 * B * 16), 0, H, jnp.int32)


def probe_body(i, acc):
    v = jnp.take_along_axis(tab, (probe + i) % H, axis=1)
    return acc + v.sum()


timeit("elementwise row-probe [S,256] of [S,4096]", loop(probe_body), jnp.zeros((), jnp.int32))
