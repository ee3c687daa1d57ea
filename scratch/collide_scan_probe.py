"""Chip timing: Pallas collision scan vs the XLA fori scan + new fused cost.

Run: python scratch/collide_scan_probe.py [S_kilotokens]
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

from magicpig_tpu.ops.bitcodes import build_planes, collision_words, hash_bits
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.pallas.collide import collision_words_pallas
from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode
from magicpig_tpu.ops.quant import quantize_rows

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NSTEP = 64
S = SK * 1024
B, HQ, HKV, G, D = 1, 32, 8, 4, 64
FOLD = 128 // D
K, L = 10, 150
print(f"S={S} NSTEP={NSTEP}", flush=True)
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
    np.asarray(run(qs))
    tc = time.perf_counter() - t0
    q2 = qs + jnp.asarray(1e-3, qs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:52s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


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
planes = jax.vmap(lambda k: build_planes(k, proj, K))(jnp.moveaxis(kf, 1, 2))
length = jnp.full((B,), S, jnp.int32)
PLANE_BYTES = B * HKV * L * K * (S // 32) * 4
KV_BYTES = 2 * B * HKV * S * D

# parity on real planes/queries
qb = hash_bits(qs[0], proj, K)
want = np.asarray(collision_words(qb, planes))
got = np.asarray(collision_words_pallas(qb, planes))
assert (got == want).all(), "pallas scan != XLA scan on hardware"
print("hardware parity: pallas scan bit-exact", flush=True)

for wblk in (256, 512, 1024):
    scan_time(f"pallas collision scan wblk={wblk}",
              lambda q, _w=wblk: collision_words_pallas(
                  hash_bits(q, proj, K), planes, word_block=_w),
              qs, bytes_=PLANE_BYTES)
scan_time("XLA collision scan (incumbent)",
          lambda q: collision_words(hash_bits(q, proj, K), planes),
          qs, bytes_=PLANE_BYTES)
scan_time("lsh_fused_decode (pallas scan + attend)",
          lambda q: lsh_fused_decode(
              q, k8f, v8f, k_norm, planes, hash_bits(q, proj, K),
              length, K, L, k_scale=ksc_f, v_scale=vsc_f),
          qs, bytes_=KV_BYTES + PLANE_BYTES)
print("DONE", flush=True)
