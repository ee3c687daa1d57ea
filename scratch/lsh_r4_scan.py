"""Round-4 LSH decision probe, scan-harness edition.

The dispatch-based lsh_r3_probe numbers are RTT/queue-polluted for cheap
XLA ops (full_decode read 24.5 ms where the production decode scan pays
0.50). This probe times every stage INSIDE a lax.scan over NSTEP distinct
queries — one dispatch, per-step cost isolated, loop-invariant hoisting
identical to the production decode scan (which also runs per-step ops
under lax.scan with planes/caches as invariant carry).

Stages, per sparse layer at the bench shape (96K, d=64, B=1, K10/L150,
int8 offload):
  a. flash_decode int8 (the dense per-layer competitor)
  b. collision_words (planes 147 MB)
  c. full mask glue: collision + valid + unpack to [B,Hq,S] bool
  d. lsh_masked_attention, debias in {exact, poly, none} x blk sweep
  e. lsh_fused_decode end-to-end (exact vs poly)
  f. B=2 single-grid compile attempt (the round-2 tpu_compile_helper
     HTTP 500 — retest on this round's toolchain)

Run: python scratch/lsh_r4_scan.py [S_kilotokens] [NSTEP]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from magicpig_tpu.ops.bitcodes import (build_planes, collision_words,
                                       hash_bits, unpack_words, valid_words)
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.pallas.decode import flash_decode
from magicpig_tpu.ops.pallas.lsh_decode import (lsh_fused_decode,
                                                lsh_masked_attention)
from magicpig_tpu.ops.quant import quantize_rows

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 64
S = SK * 1024
B, HQ, HKV, G, D = 1, 32, 8, 4, 64
FOLD = 128 // D
K, L = 10, 150

print(f"S={S} d={D} K={K} L={L} NSTEP={NSTEP}", flush=True)
print(jax.devices(), flush=True)

rng = np.random.default_rng(0)


def scan_time(name, step_fn, qs, bytes_=None, n=NSTEP):
    @jax.jit
    def run(qs):
        def body(carry, q):
            out = step_fn(q)
            return carry + jax.tree.leaves(out)[0].ravel()[0].astype(
                jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return total
    t0 = time.perf_counter()
    np.asarray(run(qs))                  # compile+warm
    tc = time.perf_counter() - t0
    q2 = qs + jnp.asarray(1e-3, qs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:58s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


# -- state ---------------------------------------------------------------
proj = make_hash_projections(jax.random.key(0), D, K, L)
qs = jnp.asarray(rng.standard_normal((NSTEP, B, HQ, D)), jnp.float32)
kf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
vf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
k_norm = jnp.linalg.norm(kf, axis=-1).astype(jnp.float32)
k8, ksc = quantize_rows(kf)
v8, vsc = quantize_rows(vf)
k8f = k8.reshape(B, HKV, S // FOLD, D * FOLD)
v8f = v8.reshape(B, HKV, S // FOLD, D * FOLD)
ksc_f = ksc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
vsc_f = vsc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
planes = jax.vmap(lambda k: build_planes(k, proj, K))(
    jnp.moveaxis(kf, 1, 2))  # [B, Hkv, L, K, W]
length = jnp.full((B,), S, jnp.int32)
kbf, vbf = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
k8d, k8dsc = quantize_rows(kf)          # dense int8 layout for flash_decode
k8df = k8d.reshape(B, HKV, S // FOLD, D * FOLD)
sc_fold = ksc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
vsc_fold = vsc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)

KV_BYTES = 2 * B * HKV * S * D          # int8 K+V
PLANE_BYTES = B * HKV * L * K * (S // 32) * 4

# a. dense competitor, block sweep: is flash_decode grid-step-bound at
# its 8192 default? (bf16 and int8 took the SAME ~0.6 ms despite 2x the
# bytes — consistent with per-step cost, not bandwidth)
for blk in (8192, 16384, 32768):
    scan_time(f"flash_decode int8 blk={blk}",
              lambda q, _b=blk: flash_decode(q, k8df, v8f, length,
                                             block_tokens=_b,
                                             k_scale=sc_fold,
                                             v_scale=vsc_fold),
              qs, bytes_=KV_BYTES)
for blk in (8192, 16384, 32768):
    scan_time(f"flash_decode bf16 blk={blk}",
              lambda q, _b=blk: flash_decode(q, kbf, vbf, length,
                                             block_tokens=_b),
              qs, bytes_=2 * KV_BYTES)

# d. attend alone (fixed mask -> glue hoisted out of the scan)
mask_fixed = jnp.asarray(rng.random((B, HQ, S)) < 0.02)
for blk in (16384, 32768, 65536):
    try:
        scan_time(
            f"lsh_masked_attention int8 blk={blk}",
            lambda q, _b=blk: lsh_masked_attention(
                q, k8f, v8f, k_norm, mask_fixed, K, L, block_tokens=_b,
                k_scale=ksc_f, v_scale=vsc_f),
            qs, bytes_=KV_BYTES)
    except Exception as e:  # noqa: BLE001
        print(f"blk={blk}: {type(e).__name__}: {str(e)[:160]}", flush=True)

# e. fused end to end
scan_time("lsh_fused_decode (scan+glue+attend)",
          lambda q: lsh_fused_decode(
              q, k8f, v8f, k_norm, planes, hash_bits(q, proj, K),
              length, K, L, k_scale=ksc_f, v_scale=vsc_f),
          qs, bytes_=KV_BYTES + PLANE_BYTES)

# f. B=2 batched single-grid compile retest
print("B=2 batched single-grid compile attempt...", flush=True)
try:
    q2 = jnp.asarray(rng.standard_normal((2, HQ, D)), jnp.float32)
    big = {
        "k": jnp.concatenate([k8f, k8f], 0),
        "v": jnp.concatenate([v8f, v8f], 0),
        "n": jnp.concatenate([k_norm, k_norm], 0),
        "m": jnp.concatenate([mask_fixed, mask_fixed], 0),
        "ks": jnp.concatenate([ksc_f, ksc_f], 0),
        "vs": jnp.concatenate([vsc_f, vsc_f], 0),
    }
    t0 = time.perf_counter()
    out = lsh_masked_attention(q2, big["k"], big["v"], big["n"], big["m"],
                               K, L, block_tokens=32768, k_scale=big["ks"],
                               v_scale=big["vs"], batch_split=False)
    print(f"B=2 batched grid COMPILES+RUNS ok "
          f"({time.perf_counter()-t0:.0f}s): {np.asarray(out[0]).shape}",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"B=2 batched grid FAILS: {type(e).__name__}: {str(e)[:300]}",
          flush=True)
print("DONE", flush=True)
