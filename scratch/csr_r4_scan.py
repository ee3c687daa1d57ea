"""Round-4 CSR-retrieval decisive probe (scan harness, vectorized).

The reference keeps bucket-sorted id tables per (kv-head, hash table)
(`/root/reference/library/lsh/lsh.cc:63-89`: table_start/table_end/table)
and reads L bucket segments per query head. The round-3 vmapped
dynamic-slice formulation did not even compile through the remote tunnel
(HTTP 413: 4800 unrolled slices). This probe measures the vectorized
TPU form of the same retrieval:

  5a. segment reads as ONE take_along_axis gather: per (q-head, table)
      a SEG=128-id window at the query bucket's start — [HQ, L, SEG] ids
  5b. the ids -> per-token >=2-collision mask conversion (scatter-add,
      the step with no good vectorized TPU form)

against the bit-plane scan (`collision_words`) those would replace.
State arithmetic is printed too: CSR id tables are S*L*4 B per kv-head
(~472 MB/layer at 96K) vs K*L-bit packed planes (147 MB/layer) — CSR
LOWERS max batch even if it were faster per step.

Run: python scratch/csr_r4_scan.py [S_kilotokens] [NSTEP]
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

SK = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 64
S = SK * 1024
B, HQ, HKV, G, D = 1, 32, 8, 4, 64
K, L = 10, 150
SEG = 128

print(f"S={S} K={K} L={L} SEG={SEG} NSTEP={NSTEP}", flush=True)
print(jax.devices(), flush=True)
rng = np.random.default_rng(0)


def scan_time(name, step_fn, qs, consts=(), bytes_=None, n=NSTEP):
    """consts are passed as jit ARGS: a closed-over device array becomes
    an embedded constant shipped inside the remote-compile request — the
    472 MB CSR table blew its body-size limit (HTTP 413)."""
    @jax.jit
    def run(qs, consts):
        def body(carry, q):
            out = step_fn(q, *consts)
            return carry + jax.tree.leaves(out)[0].ravel()[0].astype(
                jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return total
    t0 = time.perf_counter()
    np.asarray(run(qs, consts))
    tc = time.perf_counter() - t0
    q2 = qs + jnp.ones((), qs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2, consts))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:58s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


# Bucket-sorted id table per (kv-head, table) + prefix starts.
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

# Query buckets per step: [NSTEP, HQ, L] int32.
qcs = jnp.asarray(rng.integers(0, 1 << K, size=(NSTEP, HQ, L)), jnp.int32)


def csr_read(qc, table, starts):
    """[HQ, L] buckets -> ([HQ, L, SEG] ids, valid) via one gather."""
    qg = qc.reshape(HKV, G, L)
    st = jnp.take_along_axis(starts, qg.transpose(0, 2, 1), axis=-1)
    en = jnp.take_along_axis(starts, qg.transpose(0, 2, 1) + 1, axis=-1)
    base = jnp.clip(st, 0, S - SEG)                 # [HKV, L, G]
    idx = base[..., None] + jnp.arange(SEG)         # [HKV, L, G, SEG]
    ids = jnp.take_along_axis(table, idx.reshape(HKV, L, G * SEG), axis=-1)
    ids = ids.reshape(HKV, L, G, SEG).transpose(0, 2, 1, 3).reshape(
        HQ, L, SEG)
    nvalid = (en - st).transpose(0, 2, 1).reshape(HQ, L)
    valid = jnp.arange(SEG) < nvalid[..., None]
    return ids, valid


def csr_mask(qc, table, starts):
    ids, valid = csr_read(qc, table, starts)
    cnt = jnp.zeros((HQ, S), jnp.int32)
    cnt = cnt.at[jnp.arange(HQ)[:, None, None], ids].add(
        valid.astype(jnp.int32), mode="drop")
    return cnt >= 2


scan_time(f"CSR 5a: {HQ}x{L} bucket-segment gather (SEG={SEG})",
          csr_read, qcs, consts=(table, starts), bytes_=HQ * L * SEG * 4)
scan_time("CSR 5a+5b: gather + scatter-add to >=2 mask",
          csr_mask, qcs, consts=(table, starts), bytes_=HQ * L * SEG * 4)

# The plane scan these would replace (same harness, same chip session).
proj = make_hash_projections(jax.random.key(0), D, K, L)
kf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
planes = jax.vmap(lambda k: build_planes(k, proj, K))(
    jnp.moveaxis(kf, 1, 2))
qs = jnp.asarray(rng.standard_normal((NSTEP, B, HQ, D)), jnp.float32)
PLANE_BYTES = B * HKV * L * K * (S // 32) * 4
scan_time("bit-plane collision scan (the incumbent)",
          lambda q, pl_, pr: collision_words(hash_bits(q, pr, K), pl_),
          qs, consts=(planes, proj), bytes_=PLANE_BYTES)

print(f"\nstate: CSR id tables {HKV * L * S * 4 / 1e6:.0f} MB/layer vs "
      f"planes {PLANE_BYTES / 1e6:.0f} MB/layer", flush=True)
print("DONE", flush=True)
