"""Per-layer decode cost of each estimator at 96K on the real chip."""
import sys

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scratch")
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench_util import timeit
from magicpig_tpu.ops.attention import (collision_mask, full_decode,
                                        lsh_masked_decode, lsh_sampled_decode,
                                        mask_to_budget_ids)
from magicpig_tpu.ops.baselines import block_topk_decode, quest_decode, quest_landmarks
from magicpig_tpu.ops.bitcodes import collision_words, hash_bits, unpack_words
from magicpig_tpu.ops.hashing import make_hash_projections

print(jax.devices())
N = 12
rng = np.random.default_rng(0)

for D in (64, 128):
    S = 96 * 1024
    B, HKV, G = 1, 8, 4
    HQ = HKV * G
    K, L = 10, 150
    W = S // 32
    print(f"--- d={D} S={S} ---")
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
    knorm = jnp.asarray(np.abs(rng.standard_normal((B, HKV, S))) * 8 + 1,
                        jnp.float32)
    planes = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (B, HKV, L, K, W)),
                         jnp.int32)
    ln = jnp.asarray([S], jnp.int32)
    proj = make_hash_projections(jax.random.key(0), D, K, L)
    qs = [jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
          for _ in range(N + 1)]

    timeit(f"full_decode (baseline) d{D}",
           jax.jit(lambda q: full_decode(q, kc, vc, ln)),
           [(q,) for q in qs], bytes_=2 * kc.size * 2)

    timeit(f"block_topk 8% d{D}",
           jax.jit(lambda q: block_topk_decode(q, kc, vc, ln, 128, 60)),
           [(q,) for q in qs], bytes_=kc.size * 2)

    @jax.jit
    def lsh_masked_full(q):
        qb = hash_bits(q, proj, K)
        words = collision_words(qb, planes)
        mask = unpack_words(words, S)
        return lsh_masked_decode(q, kc, vc, knorm, mask, ln, K, L)

    timeit(f"lsh masked (planes) d{D}", lsh_masked_full,
           [(q,) for q in qs], bytes_=planes.size * 4 + 2 * kc.size * 2)

    @jax.jit
    def lsh_sampled_full(q):
        qb = hash_bits(q, proj, K)
        words = collision_words(qb, planes)
        mask = unpack_words(words, S)
        ids, idsv = mask_to_budget_ids(mask, 6144)
        return lsh_sampled_decode(q, kc, vc, knorm, ids, idsv, K, L)

    timeit(f"lsh sampled (planes+topk+gather) d{D}", lsh_sampled_full,
           [(q,) for q in qs])

    kmin, kmax = quest_landmarks(kc, 16)

    timeit(f"quest 4% d{D}",
           jax.jit(lambda q: quest_decode(q, kc, vc, kmin, kmax, ln, 16,
                                          245)),
           [(q,) for q in qs])
