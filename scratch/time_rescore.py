"""Per-layer decode-step cost of the round-2b pipelines (scan-timing, TPU).

Compares, at the flagship shape (S=96K, d=64, Hkv=8, G=4):
  a) score-store int8:  exact_scores_ranked + top_k + block_attend
  b) rescore int8:      block_rank + top_k + rescore_attend
  c) rescore int4-pack: same over nibble-packed K (half the K stream)
  d) dense layer:       flash_decode bf16 vs int8 KV

Run on the real chip: `timeout 550 python scratch/time_rescore.py [B]`.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from magicpig_tpu.ops.pack4 import (
    SPAN_TOKENS,
    group_length_mask,
    group_scales,
    pack_rows,
)
from magicpig_tpu.ops.pallas.block_attend import block_attend
from magicpig_tpu.ops.pallas.decode import flash_decode
from magicpig_tpu.ops.pallas.rescore_attend import rescore_attend
from magicpig_tpu.ops.pallas.score import (
    block_rank,
    exact_scores_ranked,
    length_mask,
)

print(jax.devices())
B = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NSTEP = 128
HKV, G, D = 8, 4, 64
S = 96 * 1024
BS = SPAN_TOKENS
NB = S // BS
NBP = 16
FOLD = 128 // D

rng = np.random.default_rng(0)
kq = jnp.asarray(rng.integers(-7, 8, (B, HKV, S // FOLD, 128)), jnp.int8)
ksT = jnp.asarray(np.abs(rng.standard_normal((B, HKV, S))) * 0.05,
                  jnp.float32)                       # token-order scales
ks = ksT.reshape(B, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
kp = pack_rows(kq, FOLD)
ksg = group_scales(ksT, FOLD)
vq = jnp.asarray(rng.integers(-127, 127, (B, HKV, S // FOLD, 128)), jnp.int8)
vs = jnp.asarray(np.abs(rng.standard_normal((B, HKV, FOLD, S // FOLD)))
                 * 0.05, jnp.float32)
qs = jnp.asarray(rng.standard_normal((NSTEP, B, HKV * G, D)), jnp.float32)
ln = jnp.full((B,), S - 100, jnp.int32)
mask = length_mask(ln, S, FOLD)
maskg = group_length_mask(ln, S, FOLD)


def scan_time(name, step_fn, n=NSTEP, bytes_=None):
    @jax.jit
    def run(qstack):
        def body(carry, q):
            out = step_fn(q)
            return carry, jax.tree.leaves(out)[0].ravel()[0]
        _, outs = jax.lax.scan(body, 0, qstack)
        return outs.sum()
    np.asarray(run(qs))
    q2 = qs + jnp.asarray(1e-3, qs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_ / dt / 1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:46s} {dt * 1e3:8.3f} ms{extra}", flush=True)


def pipe_store_int8(q):
    scores, bm = exact_scores_ranked(q, kq, ks, mask, BS)
    _, ids = jax.lax.top_k(bm, NBP)
    return block_attend(scores, ids, vq, vs, BS, D)


def pipe_rescore_int8(q):
    bm = block_rank(q, kq, ks, mask, BS)
    _, ids = jax.lax.top_k(bm, NBP)
    return rescore_attend(q, ids, kq, ks, vq, vs, ln, BS, D)


def pipe_rescore_int4(q):
    bm = block_rank(q, kp, ksg, maskg, BS, packed=True)
    _, ids = jax.lax.top_k(bm, NBP)
    return rescore_attend(q, ids, kp, ksg, vq, vs, ln, BS, D, packed=True)


scan_time(f"a) score-store int8  B{B}", pipe_store_int8, bytes_=kq.size)
scan_time(f"b) rescore     int8  B{B}", pipe_rescore_int8, bytes_=kq.size)
scan_time(f"c) rescore     int4p B{B}", pipe_rescore_int4, bytes_=kp.size)

kb = jnp.asarray(rng.standard_normal((B, HKV, S // FOLD, 128)), jnp.bfloat16)
vb = jnp.asarray(rng.standard_normal((B, HKV, S // FOLD, 128)), jnp.bfloat16)
scan_time(f"d) flash_decode bf16 B{B}",
          lambda q: flash_decode(q, kb, vb, ln), bytes_=kb.size * 4)
scan_time(f"e) flash_decode int8 B{B}",
          lambda q: flash_decode(q, kq, vq, ln, k_scale=ks, v_scale=vs),
          bytes_=kq.size * 2)
