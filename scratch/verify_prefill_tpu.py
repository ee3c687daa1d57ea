"""TPU drive for the Pallas prefill kernel (Mosaic compile path).

Interpret-mode parity is covered by tests/test_prefill_pallas.py; this
checks the kernel on the REAL chip against the XLA flash_prefill oracle at
representative shapes (d=64 fold=2 production, d=128 fold=1, sliding
window, chunked q_offset), then times a 16K-prompt layer to sanity-check
the speedup claim before running the full 96K bench.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices())

from magicpig_tpu.ops.attention import flash_prefill
from magicpig_tpu.ops.pallas.prefill import flash_prefill_pallas

rng = np.random.default_rng(0)


def oracle(q, k, v, length, window=None):
    b, p = q.shape[:2]
    sub = 256
    outs = []
    for off in range(0, p, sub):
        outs.append(flash_prefill(q[:, off:off + sub], k, v, jnp.int32(off),
                                  jnp.int32(off + sub), block_k=sub,
                                  window=window))
    return jnp.concatenate(outs, axis=1)


for (B, HKV, G, P, D, length, window) in [
        (1, 2, 4, 2048, 64, 2048, None),
        (2, 2, 2, 1024, 64, 700, None),
        (1, 2, 4, 1024, 64, 900, 256),
        (1, 1, 4, 1024, 128, 800, None),
]:
    q = jnp.asarray(rng.standard_normal((B, P, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    lens = jnp.full((B,), length, jnp.int32)
    got = flash_prefill_pallas(q, k, v, lens, window=window)
    want = oracle(q, k, v, length, window=window)
    err = np.abs(np.asarray(got[:, :length], np.float32)
                 - np.asarray(want[:, :length], np.float32)).max()
    print(f"B{B} HKV{HKV} G{G} P{P} d{D} len{length} w{window}: "
          f"max err {err:.5f}")
    assert err < 5e-2, err

# q_offset chunk path (interleaved admission / chunked prefill).
B, SKV, SQ, OFF, HKV, G, D = 1, 4096, 1024, 2048, 2, 4, 64
q = jnp.asarray(rng.standard_normal((B, SQ, HKV * G, D)), jnp.float32)
k = jnp.asarray(rng.standard_normal((B, SKV, HKV, D)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, SKV, HKV, D)), jnp.float32)
got = flash_prefill_pallas(q, k, v, jnp.asarray([OFF + SQ], jnp.int32),
                           q_offset=jnp.asarray([OFF], jnp.int32))
want = flash_prefill(q, k, v, jnp.int32(OFF), jnp.int32(OFF + SQ),
                     block_k=256)
err = np.abs(np.asarray(got) - np.asarray(want)).max()
print(f"chunk q_offset: max err {err:.5f}")
assert err < 5e-2, err

# Timing: one layer's attention at 16K prompt, production shape
# (Hkv=8, G=4, d=64 — llama-3.2-1b). Report both paths.
B, P, HKV, G, D = 1, 16384, 8, 4, 64
q = jnp.asarray(rng.standard_normal((B, P, HKV * G, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.bfloat16)
lens = jnp.full((B,), P, jnp.int32)


def time_fn(f, *a, n=5, **kw):
    f(*a, **kw).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a, **kw)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


tp = time_fn(flash_prefill_pallas, q, k, v, lens)
tx = time_fn(lambda *a: oracle(*a), q, k, v, P)
print(f"16K layer attention: pallas {tp * 1e3:.1f} ms  xla-scan "
      f"{tx * 1e3:.1f} ms  ({tx / tp:.2f}x)")
print("VERIFY OK")
