"""TPU probe for the fused LSH decode partial (run when a chip is claimable).

Answers three round-2 questions in one claim:
  1. does the per-request batch_split make the B=2 fused graph compile on
     this toolchain's remote tpu_compile_helper (round-2 bisect: the
     BATCHED B>=2 graph crashed it);
  2. per-layer cost of scan + attend at 96K with the new 64K-token blocks
     (lsh_decode.py block_tokens default 4096 -> 65536) vs the old blocks;
  3. parity of the big-block Mosaic kernel vs the XLA masked oracle.

Scan-timing harness as in BENCHMARKS.md: 64 steps inside one lax.scan so
per-step cost is isolated from the tunnel round-trip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices())
INTERP = jax.default_backend() == "cpu"

from magicpig_tpu.ops.bitcodes import hash_bits, pack_bitplanes
from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode
from magicpig_tpu.ops.quant import quantize_rows


HKV, G, D, K, L = 8, 4, 64, 10, 150
S = int(os.environ.get("PROBE_S", "98304"))
STEPS = int(os.environ.get("PROBE_STEPS", "64"))
FOLD = 128 // D
rng = np.random.default_rng(0)
proj = jnp.asarray(rng.standard_normal((D, L * K)), jnp.float32)


def build(b):
    k = jnp.asarray(rng.standard_normal((b, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, HKV, S, D)), jnp.float32)
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    knorm = jnp.linalg.norm(k, axis=-1)
    # Chunked plane build: the unpacked bit tensor at 96K is ~4.7 GB/request,
    # so hash+pack 8192 tokens at a time and concatenate the word dim.
    parts = []
    for s0 in range(0, S, 8192):
        bits = hash_bits(k[:, :, s0:s0 + 8192], proj, K)  # [b,HKV,8192,L,K]
        parts.append(pack_bitplanes(bits))
    planes = jnp.concatenate(parts, axis=-1)              # [b,HKV,L,K,W]
    kf = kq.reshape(b, HKV, S // FOLD, 128)
    vf = vq.reshape(b, HKV, S // FOLD, 128)
    sf = lambda s: s.reshape(b, HKV, S // FOLD, FOLD).transpose(0, 1, 3, 2)
    length = jnp.full((b,), S - 304, jnp.int32)
    return kf, vf, sf(ks), sf(vs), knorm, planes, length


def timed(fn, *args, steps=STEPS, tag=""):
    @jax.jit
    def scan(q0, qb0):
        def body(c, _):
            q, qb = c
            out, lse, cnt = fn(q, qb)
            q = q + out[..., :D].astype(q.dtype) * 1e-6
            return (q, qb), cnt.sum()
        (qf, _), cs = jax.lax.scan(body, (q0, qb0), None, length=steps)
        return qf, cs
    q0 = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    qb0 = hash_bits(q0, proj, K)
    r = jax.block_until_ready(scan(q0, qb0))
    t0 = time.perf_counter()
    r = jax.block_until_ready(scan(q0, qb0))
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag}: {dt * 1e3:.3f} ms/step  (sampled~{float(r[1][-1]):.0f})",
          flush=True)
    return dt


for B in (1, 2):
    kf, vf, ksc, vsc, knorm, planes, length = build(B)

    def fused(q, qb, blk):
        return lsh_fused_decode(q, kf, vf, knorm, planes, qb, length, K, L,
                                block_tokens=blk, k_scale=ksc, v_scale=vsc,
                                batch_split=B > 1, interpret=INTERP)

    t_new = timed(functools.partial(fused, blk=65536), tag=f"B={B} blk=64K")
    t_old = timed(functools.partial(fused, blk=4096), tag=f"B={B} blk=4K")
    print(f"B={B}: big-block speedup x{t_old / t_new:.2f}", flush=True)

# Parity of the big-block path vs the XLA masked oracle (B=1, small S).
S = 8192
B = 1
kf, vf, ksc, vsc, knorm, planes, length = build(1)
q = jnp.asarray(rng.standard_normal((1, HKV * G, D)), jnp.float32)
qb = hash_bits(q, proj, K)
out, lse, cnt = lsh_fused_decode(q, kf, vf, knorm, planes, qb, length, K, L,
                                 block_tokens=65536, k_scale=ksc,
                                 v_scale=vsc, interpret=INTERP)
out4, lse4, cnt4 = lsh_fused_decode(q, kf, vf, knorm, planes, qb, length,
                                    K, L, block_tokens=1024, k_scale=ksc,
                                    v_scale=vsc, interpret=INTERP)
err = np.abs(np.asarray(out) - np.asarray(out4)).max()
print(f"big-block vs small-block parity at S=8192: max err {err:.6f}, "
      f"mean sampled {float(cnt.mean()):.1f}")
assert err < 5e-3 and np.isfinite(np.asarray(out)).all()
assert np.array_equal(np.asarray(cnt), np.asarray(cnt4))
print("PROBE OK")
