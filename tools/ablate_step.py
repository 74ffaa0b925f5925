"""Ablation micro-bench: per-step cost of each wavefront-body component at
production shapes, each inside a fori_loop to amortize dispatch.

Usage: python tools/ablate_step.py [S] [P] [B]
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
import numpy as np

S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N = S * B
CAND = B * 129
T = 4096 * B + 1
ITERS = int(os.environ.get("ABLATE_ITERS", "500"))

from megagta_tpu.graph.sdbg import SdBG
from megagta_tpu.search.wavefront import DeviceGraph

dbg = SdBG.load(os.path.join(REPO, ".bench_cache", "graph", "44"))
graph = DeviceGraph.from_sdbg(dbg, precompute_hops=False)
G = graph.succ.shape[0]

key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{name:32s} {1000*dt/ITERS:8.3f} ms/step")


def loop(body):
    def fn(x):
        return jax.lax.fori_loop(0, ITERS, body, x)
    return fn


# 1. 3-hop succ gathers + multi1 + msc
nodes0 = jax.random.randint(key, (N,), 0, G - 1, jnp.int32)
msc = jnp.zeros((2, 600, 22), jnp.float32)


def hop_body(i, nodes):
    l1 = graph.succ[nodes]
    l2 = graph.succ[l1].reshape(N, 16)
    l3 = graph.succ[l2].reshape(N, 64)
    v = (~graph.invalid[l3]).astype(jnp.int32)
    m1 = graph.is_multi1[jnp.repeat(l1, 16, axis=1)]
    m2 = graph.is_multi1[jnp.repeat(l2, 4, axis=1)]
    m3 = graph.is_multi1[l3]
    e = msc[0, jnp.clip(l3[:, :1], 0, 599), jnp.clip(l3 % 22, 0, 21)]
    mix = (v + m1 + m2 + m3).sum(axis=1) + e.sum(axis=1).astype(jnp.int32)
    return (nodes0 + mix % 3) % (G - 1)


timeit("3hop gathers+msc", loop(hop_body), nodes0)

# 2. kill compare [S, P, B]
pool_a = jax.random.randint(key, (S, P), 0, G, jnp.int32)
sel_a = jax.random.randint(key, (S, B), 0, G, jnp.int32)


def kill_body(i, a):
    same = (a[:, :, None] == sel_a[:, None, :]).any(axis=-1)
    return a + same.astype(jnp.int32)


timeit("kill compare [S,P,B]", loop(kill_body), pool_a)

# 3. compact sort: 12-operand [S, P]
ops0 = tuple(jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32) for _ in range(12))


def sort_body(i, ops):
    s = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
    return (s[0] + 1,) + s[1:]


timeit("compact sort 12-op", loop(sort_body), ops0)

# 4. trace dynamic_update_slice [S, T, 8]
trace = jnp.zeros((S, T, 8), jnp.int32)
blk = jnp.ones((S, B, 8), jnp.int32)


def trace_body(i, tr):
    return jax.lax.dynamic_update_slice(tr, blk, (0, i * B + 1, 0))


timeit(f"trace DUS [S,{T},8]", loop(trace_body), trace)

# 5. pool append DUS [S, P, 8] block CAND
pool_i = jnp.zeros((S, P, 8), jnp.int32)
cblk = jnp.ones((S, CAND, 8), jnp.int32)


def pool_body(i, p):
    return jax.lax.dynamic_update_slice(p, cblk, (0, (i * 37) % (P - CAND), 0))


timeit("pool append DUS", loop(pool_body), pool_i)

# 6. approx_max_k [S, P]
fv = jax.random.normal(key, (S, P), jnp.float32)


def topk_body(i, x):
    v, idx = jax.lax.approx_max_k(x, B, recall_target=0.95)
    return x.at[:, 0].set(v[:, 0] + i)


timeit("approx_max_k", loop(topk_body), fv)

# 7. argmax lex [S, P]
k1 = jax.random.randint(key, (S, P), 0, 1 << 30, jnp.int32)


def argmax_body(i, x):
    m = jnp.max(x, axis=-1, keepdims=True)
    tie = x == m
    idx = jnp.argmax(tie, axis=-1)
    return x.at[:, 0].set(idx.astype(jnp.int32) + i)


timeit("argmax lex", loop(argmax_body), k1)

# 8. take_along_axis row gather [S, B] from pool
def taa_body(i, p):
    sel = (sel_a + i) % P
    si = jnp.take_along_axis(p, sel[..., None], axis=1)
    return p.at[:, :B, :].set(si + 1)


timeit("take_along_axis sel", loop(taa_body), pool_i)

# 9. compact alternatives at [S, P]: 13-op payload sort vs 2-op sort + row gather
ops13 = tuple(jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32) for _ in range(13))
def sort13_body(i, ops):
    s = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
    return (s[0] + 1,) + s[1:]
timeit("compact 13-op sort", loop(sort13_body), ops13)

pool8 = jax.random.randint(key, (S, P, 8), 0, 1 << 20, jnp.int32)
poolf3 = jax.random.normal(key, (S, P, 3), jnp.float32)
keyarr = jax.random.randint(key, (S, P), 0, 1 << 20, jnp.int32)
def sortgather_body(i, state):
    pool8, poolf3, keyarr = state
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (S, P))
    k, perm = jax.lax.sort((keyarr, idx), dimension=1, num_keys=1, is_stable=True)
    p8 = jnp.take_along_axis(pool8, perm[..., None], axis=1)
    pf = jnp.take_along_axis(poolf3, perm[..., None], axis=1)
    return (p8, pf, k + 1)
timeit("compact 2-op sort + row gather", loop(sortgather_body), (pool8, poolf3, keyarr))
