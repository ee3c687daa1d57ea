#!/usr/bin/env python
"""Round-5 LSH chip probe: fused scan+attend kernel parity + timing.

  1. PARITY: `lsh_fused_attention2` (one-kernel scan+attend, blocked
     planes) vs the XLA oracle (collision_words + blocked unpack +
     lsh_masked_decode) on real hashed keys at 96K — counts must be
     exact, outputs within bf16 tolerance.
  2. TIMING at the 1B bench geometry (d=64, Hkv=8, G=4, K10/L150, int8
     offload, 96K): fused2 at B=1/B=2 vs the round-4 two-stage path
     (XLA scan + attend kernel) — BENCHMARKS "Round-4 LSH verdict"
     numbers to beat: scan 0.826 ms + attend ~0.45 ms + glue.
  3. RECORD (VERDICT r4 weak#2/item 6): the retired `collide.py` Pallas
     scan at its SHIPPED defaults (word_block=128, 96 MB vmem cap),
     timed to completion on flat planes.

Sections are try/except'd; the log always ends in DONE.
Run: python scratch/lsh_r5_probe.py [S_kilotokens]
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from magicpig_tpu.ops.bitcodes import (build_planes, build_planes_blocked,
                                       collision_words, hash_bits,
                                       plane_block, unpack_words_blocked,
                                       valid_words_blocked)
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.attention import lsh_masked_decode
from magicpig_tpu.ops.pallas.lsh_fused import lsh_fused_attention2
from magicpig_tpu.ops.pallas.lsh_decode import lsh_masked_attention
from magicpig_tpu.ops.quant import quantize_rows, dequantize_rows

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NSTEP = 64
S = SK * 1024
HQ, HKV, G, D = 32, 8, 4, 64
FOLD = 128 // D
K, L = 10, 150
print(f"S={S} NSTEP={NSTEP}", flush=True)
print(jax.devices(), flush=True)
rng = np.random.default_rng(0)

proj = make_hash_projections(jax.random.key(0), D, K, L)
BLK = plane_block(S, FOLD)
print(f"plane block = {BLK} (wb={BLK // 32})", flush=True)


def make_state(B):
    kf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    k8, ksc = quantize_rows(kf)
    v8, vsc = quantize_rows(vf)
    kd = dequantize_rows(k8, ksc, jnp.float32)
    k_norm = jnp.linalg.norm(kd, axis=-1).astype(jnp.float32)
    planes_b = jax.vmap(lambda k: build_planes_blocked(
        k, proj, K, BLK, FOLD))(jnp.moveaxis(kd, 1, 2))
    k8f = k8.reshape(B, HKV, S // FOLD, D * FOLD)
    v8f = v8.reshape(B, HKV, S // FOLD, D * FOLD)
    ksc_f = ksc.astype(jnp.float32).reshape(
        B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
    vsc_f = vsc.astype(jnp.float32).reshape(
        B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
    length = jnp.full((B,), S - 500, jnp.int32)
    return kd, vf, k_norm, planes_b, k8f, v8f, ksc_f, vsc_f, length


def scan_time(name, step_fn, qs, big=(), bytes_=None, n=NSTEP):
    """big: large device arrays passed as JIT ARGS (a closed-over array
    >~150 MB becomes a compile-request constant and 413s the remote
    compile — axon-tpu-measurement-pitfalls)."""
    @jax.jit
    def run(qs, *big):
        def body(carry, q):
            out = step_fn(q, *big)
            return carry + jax.tree.leaves(out)[0].ravel()[0].astype(
                jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return total
    t0 = time.perf_counter()
    np.asarray(run(qs, *big))
    tc = time.perf_counter() - t0
    q2 = qs + jnp.asarray(1e-3, qs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2, *big))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:56s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


PLANE_BYTES = HKV * L * K * (S // 32) * 4
KV_BYTES = 2 * HKV * S * D

# ---- 1. parity ------------------------------------------------------------
try:
    kd, vf, k_norm, planes_b, k8f, v8f, ksc_f, vsc_f, length = make_state(1)
    q = jnp.asarray(rng.standard_normal((1, HQ, D)), jnp.float32)
    qb = hash_bits(q, proj, K)
    words = collision_words(qb, planes_b)
    words = words & valid_words_blocked(length, S, BLK, FOLD)[:, None]
    mask = unpack_words_blocked(words, BLK, FOLD, S)
    o_ref, l_ref = lsh_masked_decode(q, kd, vf, k_norm, mask, length, K, L)
    o_f, l_f, c_f = lsh_fused_attention2(
        q, k8f, v8f, k_norm, planes_b, qb, length, K, L,
        k_scale=ksc_f, v_scale=vsc_f)
    cnt_ok = np.array_equal(np.asarray(c_f),
                            np.asarray(mask.sum(-1), np.float32))
    err = float(jnp.max(jnp.abs(o_f - o_ref)))
    lerr = float(jnp.max(jnp.abs(l_f - l_ref)))
    frac = float(np.asarray(mask.sum()) / (HQ * (S - 500)))
    print(f"parity: counts_exact={cnt_ok} max|dout|={err:.2e} "
          f"max|dlse|={lerr:.2e} sampled_frac={frac:.4f}", flush=True)
except Exception:
    print("[parity] FAILED:", flush=True)
    traceback.print_exc()

# ---- 2. timing ------------------------------------------------------------
for B in (1, 2):
    try:
        st = make_state(B)
        kd, vf, k_norm, planes_b, k8f, v8f, ksc_f, vsc_f, length = st
        del kd, vf
        qs = jnp.asarray(rng.standard_normal((NSTEP, B, HQ, D)), jnp.float32)
        big = (k8f, v8f, k_norm, planes_b, ksc_f, vsc_f)
        scan_time(f"fused2 scan+attend int8 B={B}",
                  lambda q, k8f, v8f, k_norm, planes_b, ksc_f, vsc_f:
                  lsh_fused_attention2(
                      q, k8f, v8f, k_norm, planes_b,
                      hash_bits(q, proj, K), length, K, L,
                      k_scale=ksc_f, v_scale=vsc_f),
                  qs, big=big,
                  bytes_=B * (PLANE_BYTES + KV_BYTES + HKV * S * 4))
        # round-4 two-stage incumbent on the same state (blocked unpack)
        def two_stage(q, k8f, v8f, k_norm, planes_b, ksc_f, vsc_f):
            qb = hash_bits(q, proj, K)
            w = collision_words(qb, planes_b)
            w = w & valid_words_blocked(length, S, BLK, FOLD)[:, None]
            m = unpack_words_blocked(w, BLK, FOLD, S)
            return lsh_masked_attention(q, k8f, v8f, k_norm, m, K, L,
                                        k_scale=ksc_f, v_scale=vsc_f)
        scan_time(f"two-stage (XLA scan + attend kernel) B={B}",
                  two_stage, qs, big=big,
                  bytes_=B * (PLANE_BYTES + KV_BYTES + HKV * S * 4))
    except Exception:
        print(f"[timing B={B}] FAILED:", flush=True)
        traceback.print_exc()

# ---- 3. retired collide.py at shipped defaults (for the record) -----------
try:
    from magicpig_tpu.ops.pallas.collide import collision_words_pallas

    kf1 = jnp.asarray(rng.standard_normal((1, HKV, S, D)), jnp.float32)
    planes_flat = jax.vmap(lambda k: build_planes(k, proj, K))(
        jnp.moveaxis(kf1, 1, 2))
    qs1 = jnp.asarray(rng.standard_normal((NSTEP, 1, HQ, D)), jnp.float32)
    qb1 = hash_bits(qs1[0], proj, K)
    ok = np.array_equal(np.asarray(collision_words_pallas(qb1, planes_flat)),
                        np.asarray(collision_words(qb1, planes_flat)))
    print(f"collide.py parity (flat planes): {ok}", flush=True)
    scan_time("RECORD: collide.py pallas scan wblk=128 (shipped)",
              lambda q: collision_words_pallas(
                  hash_bits(q, proj, K), planes_flat, word_block=128),
              qs1, bytes_=PLANE_BYTES)
    scan_time("XLA collision scan (incumbent, flat)",
              lambda q: collision_words(hash_bits(q, proj, K), planes_flat),
              qs1, bytes_=PLANE_BYTES)
except Exception:
    print("[collide record] FAILED:", flush=True)
    traceback.print_exc()

print("DONE", flush=True)
