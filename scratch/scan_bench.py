"""Scan-based per-layer op timing: one dispatch, n sequential steps."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import functools

print(jax.devices())
rng = np.random.default_rng(0)
NSTEP = 256

def scan_time(name, step_fn, qs_stack, bytes_=None, n=NSTEP):
    @jax.jit
    def run(qs):
        def body(carry, q):
            out = step_fn(q)
            return carry, jax.tree.leaves(out)[0].ravel()[0]
        _, outs = jax.lax.scan(body, 0, qs)
        return outs.sum()
    np.asarray(run(qs_stack))           # compile+warm (memoized result ok)
    q2 = qs_stack + jnp.asarray(1e-3, qs_stack.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:46s} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt

from magicpig_tpu.ops.attention import (full_decode, lsh_masked_decode,
                                        lsh_sampled_decode, mask_to_budget_ids)
from magicpig_tpu.ops.baselines import block_topk_decode, quest_decode, quest_landmarks
from magicpig_tpu.ops.bitcodes import collision_words, hash_bits, unpack_words
from magicpig_tpu.ops.hashing import make_hash_projections

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
    qs = jnp.asarray(rng.standard_normal((NSTEP, B, HQ, D)), jnp.bfloat16)

    scan_time(f"full_decode (baseline) d{D}",
              lambda q: full_decode(q, kc, vc, ln), qs,
              bytes_=2 * kc.size * 2)
    scan_time(f"block_topk 8% d{D}",
              lambda q: block_topk_decode(q, kc, vc, ln, 128, 60), qs,
              bytes_=kc.size * 2)

    def lsh_mask_only(q):
        qb = hash_bits(q, proj, K)
        return collision_words(qb, planes)
    scan_time(f"lsh mask words only d{D}", lsh_mask_only, qs,
              bytes_=planes.size * 4)

    def lsh_masked_full(q):
        qb = hash_bits(q, proj, K)
        words = collision_words(qb, planes)
        mask = unpack_words(words, S)
        return lsh_masked_decode(q, kc, vc, knorm, mask, ln, K, L)
    scan_time(f"lsh masked (planes) d{D}", lsh_masked_full, qs,
              bytes_=planes.size * 4 + 2 * kc.size * 2)

    def lsh_sampled_full(q):
        qb = hash_bits(q, proj, K)
        words = collision_words(qb, planes)
        mask = unpack_words(words, S)
        ids, idsv = mask_to_budget_ids(mask, 6144)
        return lsh_sampled_decode(q, kc, vc, knorm, ids, idsv, K, L)
    scan_time(f"lsh sampled d{D}", lsh_sampled_full, qs)

    kmin, kmax = quest_landmarks(kc, 16)
    scan_time(f"quest 4% d{D}",
              lambda q: quest_decode(q, kc, vc, kmin, kmax, ln, 16, 245), qs)
