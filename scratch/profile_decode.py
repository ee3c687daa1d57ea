"""Stage-by-stage timing of decode_sparse_layer at bench shapes.

Uses pre-staged distinct inputs + scalar fetch (see calibrate.py for why).
Run: python scratch/profile_decode.py [S_kilotokens]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from magicpig_tpu.config import LSHConfig
from magicpig_tpu.ops.attention import (
    collision_mask, full_decode, lsh_masked_decode, lsh_sampled_decode,
    mask_to_budget_ids)
from magicpig_tpu.ops.hashing import hash_codes, make_hash_projections

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 16
S = SK * 1024
B, HQ, HKV, G, D = 1, 32, 8, 4, 64
K, L = 10, 150
lsh = LSHConfig(K=K, L=L)
BUDGET = lsh.sample_budget(S)
print(f"S={S} budget={BUDGET}")

rng = np.random.default_rng(0)
_small = jax.jit(lambda x: x + 1)
np.asarray(_small(jnp.zeros((), jnp.int32)))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(_small(jnp.zeros((), jnp.int32)))
RTT = (time.perf_counter() - t0) / 20
print(f"RTT {RTT*1e3:.2f} ms")


def timeit(name, fn, variants, n=8):
    red = jax.jit(lambda r: jax.tree.leaves(r)[0].ravel()[0])
    np.asarray(red(fn(*variants[0])))
    np.asarray(red(fn(*variants[1 % len(variants)])))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = fn(*variants[i % len(variants)])
    np.asarray(red(r))
    dt = (time.perf_counter() - t0 - RTT) / n
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def mkf(shape, nv=2, dtype=jnp.bfloat16):
    return [jnp.asarray(rng.standard_normal(shape), dtype) for _ in range(nv)]


proj = make_hash_projections(jax.random.key(0), D, K, L)
qs = mkf((B, HQ, D), nv=4)
off_k = mkf((B, HKV, S, D), nv=2)
off_v = mkf((B, HKV, S, D), nv=2)
k_norm = [jnp.abs(x[..., 0].astype(jnp.float32)) * 8 + 1 for x in off_k]
k_codes = [jnp.asarray(rng.integers(0, 1 << K, (B, HKV, L, S)), jnp.int16)
           for _ in range(2)]
length = jnp.full((B,), S, jnp.int32)

# stage 1: query hash
timeit("q hash_codes", jax.jit(lambda q: hash_codes(q, proj, K)),
       [(q,) for q in qs])

# stage 2: collision mask
qc = [hash_codes(q, proj, K) for q in qs]
timeit("collision_mask", jax.jit(collision_mask),
       [(qc[i % 4], k_codes[i % 2]) for i in range(4)])

# stage 3: mask -> budget ids
masks = [np.asarray(collision_mask(qc[i], k_codes[i % 2])) for i in range(2)]
masks = [jnp.asarray(m) for m in masks]
timeit(f"mask_to_budget_ids (top_k {BUDGET})",
       jax.jit(lambda m: mask_to_budget_ids(m, BUDGET)),
       [(m,) for m in masks])

# stage 4: sampled decode (gather + debias attention)
ids_l, valid_l = [], []
for m in masks:
    i, v = mask_to_budget_ids(m, BUDGET)
    ids_l.append(i); valid_l.append(v)
timeit("lsh_sampled_decode (gather+attn)",
       jax.jit(lambda q, k, v, n, i, vl: lsh_sampled_decode(
           q, k, v, n, i, vl, K, L)),
       [(qs[i % 4], off_k[i % 2], off_v[i % 2], k_norm[i % 2],
         ids_l[i % 2], valid_l[i % 2]) for i in range(4)])

# stage 4b: masked decode (for comparison)
timeit("lsh_masked_decode",
       jax.jit(lambda q, k, v, n, m: lsh_masked_decode(
           q, k, v, n, m, length, K, L)),
       [(qs[i % 4], off_k[i % 2], off_v[i % 2], k_norm[i % 2],
         masks[i % 2]) for i in range(4)])

# stage 5: dense full_decode over same S (the baseline per-layer cost)
timeit("full_decode (dense baseline)",
       jax.jit(lambda q, k, v: full_decode(q, k, v, length)),
       [(qs[i % 4], off_k[i % 2], off_v[i % 2]) for i in range(4)])

# stage 6: hot partial (324 tokens)
hot_k = mkf((B, HKV, 384, D), nv=2)
timeit("hot partial (384)",
       jax.jit(lambda q, k, v: full_decode(q, k, v, jnp.full((B,), 324, jnp.int32))),
       [(qs[i % 4], hot_k[i % 2], hot_k[(i + 1) % 2]) for i in range(4)])
