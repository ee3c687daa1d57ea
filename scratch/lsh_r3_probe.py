"""Round-3 LSH decision probe (hardware): attend-kernel gap + CSR verdict.

Measures, per sparse layer at the bench shape (96K, d=64, B=1, K10/L150,
int8 offload):

  1. dense `full_decode` baseline (the 0.50 ms reference point)
  2. XLA bit-plane collision scan (`collision_words`) — the 147 MB read
  3. Pallas masked attend alone (precomputed ~2% mask), sweeping
     block_tokens — where between 148 GB/s and the 813 GB/s stream floor
     does the kernel actually sit, and does block size move it
  4. `lsh_fused_decode` end to end
  5. CSR-retrieval decisive pieces (VERDICT round-2 item 3 — the
     reference's `table_start/table_end/table` layout, lsh.cc:63-89):
       a. reading L contiguous bucket lists per query head (dynamic-slice
          segment reads from a bucket-sorted id array)
       b. converting the ~L*94 candidate ids per q-head into a per-token
          >=2 mask (scatter-add — the step with no vectorized TPU form)
     plus the memory arithmetic: CSR id tables are S*L*4 B/key-head
     (~460 MB/layer at 96K) vs K*L bits packed planes (147 MB/layer), so
     CSR also LOWERS max batch. If (a)+(b) lands at or above the plane
     scan's 0.44 ms, the CSR design is retired with data.

Run on the real chip: python scratch/lsh_r3_probe.py [S_kilotokens]
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

from magicpig_tpu.config import LSHConfig
from magicpig_tpu.ops.attention import full_decode
from magicpig_tpu.ops.bitcodes import (
    build_planes, collision_words, hash_bits, unpack_words, valid_words)
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.pallas.lsh_decode import (
    lsh_fused_decode, lsh_masked_attention)
from magicpig_tpu.ops.quant import quantize_rows

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 96
S = SK * 1024
B, HQ, HKV, G, D = 1, 32, 8, 4, 64
FOLD = 128 // D
K, L = 10, 150

print(f"S={S} d={D} K={K} L={L}", flush=True)
print(jax.devices(), flush=True)

rng = np.random.default_rng(0)
_small = jax.jit(lambda x: x + 1)
np.asarray(_small(jnp.zeros((), jnp.int32)))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(_small(jnp.zeros((), jnp.int32)))
RTT = (time.perf_counter() - t0) / 20
print(f"RTT {RTT*1e3:.2f} ms", flush=True)


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
    print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
    return dt


# -- state ---------------------------------------------------------------
proj = make_hash_projections(jax.random.key(0), D, K, L)
qs = [jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
      for _ in range(4)]
kf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
vf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
k_norm = jnp.linalg.norm(kf, axis=-1).astype(jnp.float32)
k8, ksc = quantize_rows(kf)
v8, vsc = quantize_rows(vf)
# folded int8 caches + fold-major scales (state.py layout)
k8f = jnp.moveaxis(k8, 2, 2).reshape(B, HKV, S // FOLD, D * FOLD)
v8f = v8.reshape(B, HKV, S // FOLD, D * FOLD)
ksc_f = ksc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
vsc_f = vsc.astype(jnp.float32).reshape(
    B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
planes = jax.vmap(lambda k: build_planes(k, proj, K))(
    jnp.moveaxis(kf, 1, 2))  # keys [B, S, Hkv, D] -> [B, Hkv, L, K, W]
length = jnp.full((B,), S, jnp.int32)

# dense bf16 baseline
kbf = [kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)]
timeit("full_decode XLA bf16 (dense baseline)",
       lambda q: full_decode(q, kbf[0], kbf[1], length),
       [(q,) for q in qs])

# 2. the scan
q_bits = [hash_bits(q, proj, K) for q in qs]
timeit("collision_words XLA scan (planes 147MB@96K)",
       lambda qb: collision_words(qb, planes), [(qb,) for qb in q_bits])

# 3. attend alone, block sweep (precomputed ~2% mask)
mask_np = rng.random((B, HQ, S)) < 0.02
masks = [jnp.asarray(mask_np), jnp.asarray(rng.random((B, HQ, S)) < 0.02)]
for blk in (16384, 32768, 65536, S):
    try:
        timeit(f"lsh_masked_attention int8 blk={blk}",
               lambda q, m, _blk=blk: lsh_masked_attention(
                   q, k8f, v8f, k_norm, m, K, L, block_tokens=_blk,
                   k_scale=ksc_f, v_scale=vsc_f),
               [(qs[i % 4], masks[i % 2]) for i in range(4)])
    except Exception as e:  # noqa: BLE001
        print(f"blk={blk}: {type(e).__name__}: {str(e)[:120]}", flush=True)

# 4. fused end to end
timeit("lsh_fused_decode (scan + attend)",
       lambda q, qb: lsh_fused_decode(
           q, k8f, v8f, k_norm, planes, qb, length, K, L,
           k_scale=ksc_f, v_scale=vsc_f),
       [(qs[i % 4], q_bits[i % 4]) for i in range(4)])

# -- 5. CSR probe ---------------------------------------------------------
# Bucket-sorted id table per (kv-head, table): ids sorted by bucket code;
# starts[hkv, L, 2^K+1] prefix offsets. Decode reads, per (q-head, table),
# the SEG=128-id window at the query bucket's start (covers the ~94-id
# mean bucket; real impl masks the tail).
SEG = 128
codes = rng.integers(0, 1 << K, size=(HKV, L, S))
order = np.argsort(codes, axis=-1, kind="stable").astype(np.int32)
sorted_codes = np.take_along_axis(codes, order, axis=-1)
table = jnp.asarray(order)                       # [HKV, L, S] ids
starts_np = np.zeros((HKV, L, (1 << K) + 1), np.int32)
for h in range(HKV):
    for l in range(L):
        starts_np[h, l] = np.searchsorted(
            sorted_codes[h, l], np.arange((1 << K) + 1))
starts = jnp.asarray(starts_np)

qcodes = [jnp.asarray(rng.integers(0, 1 << K, size=(HQ, L)), jnp.int32)
          for _ in range(4)]


@jax.jit
def csr_read_segments(qc):
    """[HQ, L] query buckets -> [HQ, L, SEG] candidate ids (+valid mask)."""
    def per_q(h, qc_h):       # h: q-head index
        kv = h // G

        def per_tab(l, c):
            st = starts[kv, l, c]
            en = starts[kv, l, c + 1]
            ids = jax.lax.dynamic_slice(table[kv, l],
                                        (jnp.clip(st, 0, S - SEG),),
                                        (SEG,))
            valid = jnp.arange(SEG) < (en - st)
            return ids, valid
        return jax.vmap(per_tab)(jnp.arange(L), qc_h)
    return jax.vmap(per_q)(jnp.arange(HQ), qc)


timeit(f"CSR 5a: read {HQ}x{L} bucket segments (SEG={SEG})",
       csr_read_segments, [(qc,) for qc in qcodes])


@jax.jit
def csr_scatter_mask(qc):
    ids, valid = csr_read_segments(qc)           # [HQ, L, SEG]
    cnt = jnp.zeros((HQ, S), jnp.int32)
    cnt = cnt.at[jnp.arange(HQ)[:, None, None], ids].add(
        valid.astype(jnp.int32), mode="drop")
    return cnt >= 2


timeit("CSR 5a+5b: segments + scatter-add to >=2 mask",
       csr_scatter_mask, [(qc,) for qc in qcodes])

print(f"\nCSR id-table state: {HKV * L * S * 4 / 1e6:.0f} MB/layer vs "
      f"planes {HKV * L * K * (S // 32) * 4 / 1e6:.0f} MB/layer", flush=True)
