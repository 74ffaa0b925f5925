"""Cost model measurements: gathers / sorts / approx_max_k on the real TPU.

Each loop body's indices depend on the previous iteration's result so XLA
cannot hoist or fold the work. Prints ms per iteration.

Usage: python tools/gather_cost.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO]

from megagta_tpu.utils.jaxconfig import setup_jax

setup_jax()
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "100"))
key = jax.random.PRNGKey(0)
S, P, B = 3072, 4096, 8
N = S * B


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {1000*dt/ITERS:8.3f} ms/iter", flush=True)


def loop(body):
    return lambda x: jax.lax.fori_loop(0, ITERS, body, x)


# tables
tab_small = jax.random.normal(key, (600, 22), jnp.float32)  # msc-like
tab_row64 = jax.random.normal(key, (48497, 64), jnp.float32)  # succ3-like
pool = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
cand = jax.random.randint(key, (S, 1032), 0, 1 << 20, jnp.int32)

idx0 = jax.random.randint(key, (N,), 0, 600, jnp.int32)

# 1. elementwise 1D gather [N] from small table column
def g1(i, c):
    idx = (idx0 + c.astype(jnp.int32)) % 600
    v = tab_small[idx, 0]
    return (v.sum() % 7).astype(jnp.float32)
timeit("elementwise gather [24576] from [600]", loop(g1), jnp.float32(0))

# 2. row gather [N, 22] from [600, 22]
def g2(i, c):
    idx = (idx0 + c.astype(jnp.int32)) % 600
    v = tab_small[idx]
    return (v.sum() % 7).astype(jnp.float32)
timeit("row gather [24576, 22] from [600, 22]", loop(g2), jnp.float32(0))

# 3. row gather [N, 64] from [48497, 64]
idxg = jax.random.randint(key, (N,), 0, 48497, jnp.int32)
def g3(i, c):
    idx = (idxg + c.astype(jnp.int32)) % 48497
    v = tab_row64[idx]
    return (v.sum() % 7).astype(jnp.float32)
timeit("row gather [24576, 64] from [48497, 64]", loop(g3), jnp.float32(0))

# 4. take_along_axis [S, B] from [S, P]
selB = jax.random.randint(key, (S, B), 0, P, jnp.int32)
def g4(i, c):
    s = (selB + c.astype(jnp.int32)) % P
    v = jnp.take_along_axis(pool, s, axis=1)
    return (v.sum() % 7).astype(jnp.float32)
timeit("take_along_axis [3072, 8] of [3072, 4096]", loop(g4), jnp.float32(0))

# 5. take_along_axis [S, 128] from [S, 1032]
sel128 = jax.random.randint(key, (S, 128), 0, 1032, jnp.int32)
def g5(i, c):
    s = (sel128 + c.astype(jnp.int32)) % 1032
    v = jnp.take_along_axis(cand, s, axis=1)
    return (v.sum() % 7).astype(jnp.float32)
timeit("take_along_axis [3072, 128] of [3072, 1032]", loop(g5), jnp.float32(0))

# 6. take_along_axis [S, 128, 4] rows from [S, 1032, 4]
cand4 = jax.random.randint(key, (S, 1032, 4), 0, 1 << 20, jnp.int32)
def g6(i, c):
    s = (sel128 + c.astype(jnp.int32)) % 1032
    v = jnp.take_along_axis(cand4, s[..., None], axis=1)
    return (v.sum() % 7).astype(jnp.float32)
timeit("taa rows [3072, 128, 4] of [3072, 1032, 4]", loop(g6), jnp.float32(0))

# 7. take_along_axis [S, B, 128] blocks from [S, 32, 128]
blk = jax.random.randint(key, (S, P // 128, 128), 0, 1 << 20, jnp.int32)
selblk = jax.random.randint(key, (S, B), 0, P // 128, jnp.int32)
def g7(i, c):
    s = (selblk + c.astype(jnp.int32)) % (P // 128)
    v = jnp.take_along_axis(blk, s[..., None], axis=1)
    return (v.sum() % 7).astype(jnp.float32)
timeit("taa blocks [3072, 8, 128] of [3072, 32, 128]", loop(g7), jnp.float32(0))

# 8. approx_max_k [S, 1032] -> 128 (values only, no gathers)
candf = jax.random.normal(key, (S, 1032), jnp.float32)
def g8(i, c):
    v, _ = jax.lax.approx_max_k(candf + c, 128, recall_target=0.99)
    return (v.sum() % 7).astype(jnp.float32)
timeit("approx_max_k [3072, 1032] -> 128", loop(g8), jnp.float32(0))

# 9. top_k [S, 1024] -> 8
def g9(i, c):
    v, _ = jax.lax.top_k(candf[:, :1024] + c, 8)
    return (v.sum() % 7).astype(jnp.float32)
timeit("top_k [3072, 1024] -> 8", loop(g9), jnp.float32(0))

# 10-12. multi-op sort at several (width, operands)
for (w, ops) in ((1032, 7), (4096, 7), (4096, 2)):
    arrs = tuple(
        jax.random.randint(key, (S, w), 0, 1 << 20, jnp.int32) for _ in range(ops)
    )
    def gs(i, st, _w=w, _ops=ops):
        s = jax.lax.sort(st, dimension=1, num_keys=1, is_stable=True)
        return ((s[0] + i),) + s[1:]
    timeit(f"lax.sort [3072, {w}] x{ops} ops", loop(gs), arrs)

# 13. DUS append [S, 1032] block into [S, P] (x7 fields)
blk1032 = jax.random.randint(key, (S, 1032), 0, 100, jnp.int32)
pools7 = tuple(jax.random.randint(key, (S, P), 0, 100, jnp.int32) for _ in range(7))
def g13(i, st):
    off = (i * 37) % (P - 1032)
    return tuple(jax.lax.dynamic_update_slice(p, blk1032 + i, (0, off)) for p in st)
timeit("DUS [3072, 1032] x7 into [3072, 4096]", loop(g13), pools7)

# 14. full-pool masked rewrite (kill shape)
ia = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
ibx = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
def g14(i, fv):
    sa = jnp.take_along_axis(ia, (selB + i) % P, axis=1)
    sb = jnp.take_along_axis(ibx, (selB + i) % P, axis=1)
    dead = jnp.zeros((S, P), bool)
    for b in range(B):
        dead = dead | ((ia == sa[:, b:b+1]) & (ibx == sb[:, b:b+1]))
    return jnp.where(dead, -(2**31), fv)
timeit("kill: 2 taa + compare + fval rewrite", loop(g14), pool)
