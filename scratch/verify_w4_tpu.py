"""Hardware parity + timing for the Pallas packed-nibble W4 matmul.

Parity: w4_matmul on the real chip vs the XLA dequant oracle on the same
quantized weights (error should be bf16-activation-rounding only).
Timing: scan-harness per-call cost of the kernel vs the XLA decode branch
(_linear4_part, the int8-transient path) at the real model shapes —
llama-3.2-1b and llama-3.1-8b linears at B<=8.

Run: python scratch/verify_w4_tpu.py
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

from magicpig_tpu.models.llama import (W4_GROUP, _linear4_part,
                                       quantize_weight4, unpack_weight4)
from magicpig_tpu.ops.pallas.w4_matmul import w4_block_shapes, w4_matmul

print(jax.devices(), flush=True)
rng = np.random.default_rng(0)
NSTEP = 64


def scan_time(name, step_fn, xs, bytes_=None, n=NSTEP):
    @jax.jit
    def run(xs):
        def body(carry, x):
            out = step_fn(x)
            return carry + out.ravel()[0].astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return total
    t0 = time.perf_counter()
    np.asarray(run(xs))
    tc = time.perf_counter() - t0
    x2 = xs + jnp.ones((), xs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(x2))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:52s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


# -- parity ----------------------------------------------------------------
for m, kin, out in [(1, 2048, 2048), (8, 2048, 8192), (3, 14336, 4096)]:
    w = jnp.asarray(rng.standard_normal((kin, out)) / 16, jnp.float32)
    qw = quantize_weight4(w)
    x = jnp.asarray(rng.standard_normal((m, kin)), jnp.float32)
    got = np.asarray(w4_matmul(x.astype(jnp.bfloat16), qw.q, qw.scale))
    g = kin // W4_GROUP
    wde = (np.asarray(unpack_weight4(qw.q), np.float32).reshape(
        g, W4_GROUP, out) * np.asarray(qw.scale)[:, None, :]).reshape(
        kin, out)
    want = np.asarray(x) @ wde
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"parity m={m} kin={kin} out={out}: rel err {err:.5f}", flush=True)
    assert err < 5e-2, err

# -- timing at real shapes ---------------------------------------------------
# llama-3.2-1b layer linears (hidden 2048, inter 8192, hq 2048, hkv 512)
# and llama-3.1-8b (hidden 4096, inter 14336) at decode batch sizes.
SHAPES = [
    ("1b qkv+o (2048->2048)", 8, 2048, 2048),
    ("1b gate/up (2048->8192)", 8, 2048, 8192),
    ("1b down (8192->2048)", 8, 8192, 2048),
    ("8b wq/wo (4096->4096)", 1, 4096, 4096),
    ("8b wk/wv (4096->1024)", 1, 4096, 1024),
    ("8b gate/up (4096->14336)", 1, 4096, 14336),
    ("8b down (14336->4096)", 1, 14336, 4096),
    ("8b lm_head (4096->128256)", 1, 4096, 128256),
]
for name, m, kin, out in SHAPES:
    w = jnp.asarray(rng.standard_normal((kin, out)) / 16, jnp.float32)
    qw = quantize_weight4(w)
    xs = jnp.asarray(rng.standard_normal((NSTEP, m, kin)), jnp.bfloat16)
    pk_bytes = kin // 2 * out
    assert w4_block_shapes(m, kin, out) is not None, (m, kin, out)
    scan_time(f"pallas w4 {name} m={m}",
              lambda x, _q=qw.q, _s=qw.scale: w4_matmul(x, _q, _s),
              xs, bytes_=pk_bytes)
    scan_time(f"xla unpack-dot {name} m={m}",
              lambda x, _q=qw.q, _s=qw.scale: _linear4_part(
                  x.astype(jnp.float32), _q, _s),
              xs, bytes_=pk_bytes)
print("DONE", flush=True)
