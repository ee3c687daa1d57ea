"""Microbenchmarks for LSH decode-path design choices on one TPU chip.

Measures the per-layer cost of each candidate retrieval formulation at the
canonical shape (S=96K offload, Hq=32, Hkv=8, L=150, K=10, d=64):
  1. int16 code-compare mask (current `collision_mask`)
  2. bit-plane packed scan (XOR/AND word ops + pair-accumulate)
  3. jnp.sort of bucket candidates (sort-dedup path)
  4. lax.top_k vs approx_max_k for mask->ids compaction
  5. row gather at sampled ids
  6. dense full_decode partial (the thing to beat)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

S = 96 * 1024
HQ, HKV, G = 32, 8, 4
L, K, D = 150, 10, 64
W = S // 32


def timeit(name, fn, *args, n=10):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


rng = np.random.default_rng(0)
print(jax.devices())

# 1. int16 code compare ------------------------------------------------------
k_codes = jnp.asarray(rng.integers(0, 1 << K, (HKV, L, S)), jnp.int16)
q_codes = jnp.asarray(rng.integers(0, 1 << K, (HQ, L)), jnp.int16)


@jax.jit
def mask_int16(qc, kc):
    qcr = qc.reshape(HKV, G, L, 1)
    cnt = jnp.sum((qcr == kc[:, None]).astype(jnp.int16), axis=2, dtype=jnp.int16)
    return cnt >= 2


timeit("int16 code-compare mask", mask_int16, q_codes, k_codes)

# 2. bit-plane scan ----------------------------------------------------------
planes = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, (HKV, L, K, W)), jnp.int32)
q_bits = jnp.asarray(rng.integers(0, 2, (HQ, L, K)), jnp.int32)


@jax.jit
def mask_planes(qb, pl):
    # qb: [HQ, L, K] -> per (kv, g): match words
    qsel = (qb - 1).reshape(HKV, G, L, K, 1)          # 0 if bit=1 else -1
    m = pl[:, None] ^ qsel                             # [HKV,G,L,K,W]
    m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (3,))  # [HKV,G,L,W]
    # pair-accumulate over L via associative scan (a,b)
    a = m
    def comb(x, y):
        return (x[0] | y[0], x[1] | y[1] | (x[0] & y[0]))
    aa, bb = jax.lax.associative_scan(comb, (a, jnp.zeros_like(a)), axis=2)
    return bb[:, :, -1]                                # [HKV,G,W]


timeit("bit-plane scan mask", mask_planes, q_bits, planes)


@jax.jit
def mask_planes_loop(qb, pl):
    qsel = (qb - 1).reshape(HKV, G, L, K, 1)
    m = pl[:, None] ^ qsel
    m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (3,))  # [HKV,G,L,W]
    a = jnp.zeros((HKV, G, W), jnp.int32)
    b = jnp.zeros((HKV, G, W), jnp.int32)
    def body(l, ab):
        a, b = ab
        ml = jax.lax.dynamic_index_in_dim(m, l, 2, keepdims=False)
        return (a | ml, b | (a & ml))
    a, b = jax.lax.fori_loop(0, L, body, (a, b))
    return b


timeit("bit-plane scan mask (fori)", mask_planes_loop, q_bits, planes)

# 3. sort dedup --------------------------------------------------------------
NCAND = 19200
cands = jnp.asarray(rng.integers(0, S, (HQ, NCAND)), jnp.int32)


@jax.jit
def sort_dedup(c):
    s = jnp.sort(c, axis=-1)
    dup = s[:, 1:] == s[:, :-1]
    return s, dup


timeit("sort [32,19200] + dup flags", sort_dedup, cands)

# 4. compaction --------------------------------------------------------------
mask8 = jnp.asarray(rng.random((HKV, S)) < 0.08, jnp.int8)
BUDGET = 8192


@jax.jit
def topk_ids(m):
    v, i = jax.lax.top_k(m, BUDGET)
    return i, v


timeit("top_k [8,96K] k=8192 (int8)", topk_ids, mask8)

maskf = mask8.astype(jnp.float32)

@jax.jit
def topk_ids_f32(m):
    v, i = jax.lax.top_k(m, BUDGET)
    return i, v

timeit("top_k [8,96K] k=8192 (f32)", topk_ids_f32, maskf)


@jax.jit
def approx_ids(m):
    v, i = jax.lax.approx_max_k(m, BUDGET, recall_target=0.95)
    return i, v


timeit("approx_max_k [8,96K] k=8192", approx_ids, maskf)

# where-based compaction: sort ids by (1 - mask) stable
@jax.jit
def argsort_compact(m):
    order = jnp.argsort(-m, axis=-1, stable=True)
    return order[:, :BUDGET]

timeit("argsort compaction [8,96K]", argsort_compact, mask8)

# 5. gather ------------------------------------------------------------------
kcache = jnp.asarray(rng.standard_normal((HKV, S, D)), jnp.bfloat16)
ids = jnp.asarray(rng.integers(0, S, (HKV, BUDGET)), jnp.int32)


@jax.jit
def gather_rows(kc, i):
    return jax.vmap(lambda c, ii: c[ii])(kc, i)


timeit("gather [8] x 8192 rows of [96K,64]", gather_rows, kcache, ids)

ids32 = jnp.asarray(rng.integers(0, S, (HQ, 2560)), jnp.int32)
@jax.jit
def gather_rows_perq(kc, i):
    ih = i.reshape(HKV, G, -1)
    return jax.vmap(lambda c, ii: c[ii.reshape(-1)])(kc, ih)

timeit("gather [32] x 2560 rows (per-q)", gather_rows_perq, kcache, ids32)

# 6. dense decode partial ----------------------------------------------------
q = jnp.asarray(rng.standard_normal((1, HQ, D)), jnp.bfloat16)
kc4 = kcache[None]
vc4 = kcache[None]
length = jnp.asarray([S], jnp.int32)

from magicpig_tpu.ops.attention import full_decode

timeit("full_decode einsum 96K (1 layer)", jax.jit(full_decode), q, kc4, vc4, length)
