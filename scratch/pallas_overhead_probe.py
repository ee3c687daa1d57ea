"""Per-pallas_call overhead + TRUE stream floor, hoist-proof.

Two credibility problems in the round-1..3 microbench numbers:
  1. every streaming decode kernel measures ~0.55-0.65 ms/layer at 96K
     B=1 regardless of bytes (int8 100 MB vs bf16 201 MB), block size
     (8K-64K), or elementwise work — consistent with a fixed per-call or
     per-(b,h) cost, not bandwidth;
  2. the "813 GB/s stream floor" (scratch/stream_bw.py) fed the varying
     scan input to the OUTPUT of the pallas call, leaving the call
     loop-invariant — XLA while-loop LICM may have hoisted it, making
     the floor fake.

This probe passes the varying value INTO every kernel (a [8,128] bias
added to the reduce output), so nothing can hoist:
  a. trivial 128 KB reduce (1 grid step)   -> pure per-call overhead
  b. 100 MB int8 reduce, rows 16384/49152  -> true stream floor +
     per-grid-step cost
  c. 100 MB bf16 (201 MB) reduce           -> dtype effect
  d. two 128 KB calls per step             -> overhead linearity

Run: python scratch/pallas_overhead_probe.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

print(jax.devices(), flush=True)
NSTEP = 128
rng = np.random.default_rng(0)


def scan_time(name, step_fn, xs, consts=(), bytes_=None, n=NSTEP):
    @jax.jit
    def run(xs, consts):
        def body(carry, x):
            out = step_fn(x, *consts)
            return carry + jax.tree.leaves(out)[0].ravel()[0].astype(
                jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return total
    t0 = time.perf_counter()
    np.asarray(run(xs, consts))
    tc = time.perf_counter() - t0
    x2 = xs + jnp.ones((), xs.dtype)
    t0 = time.perf_counter()
    np.asarray(run(x2, consts))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:52s} {dt*1e3:8.3f} ms{extra}  (compile {tc:.0f}s)",
          flush=True)
    return dt


def _sum_kernel(b_ref, x_ref, o_ref, acc_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = b_ref[:]          # varying bias -> call cannot hoist
    acc_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0,
                          keepdims=True)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("blk_rows",))
def pallas_sum(bias, x, blk_rows):
    rows = x.shape[0]
    return pl.pallas_call(
        _sum_kernel,
        grid=(rows // blk_rows,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_rows, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(bias, x)


biases = jnp.asarray(rng.standard_normal((NSTEP, 8, 128)), jnp.float32)
tiny = jnp.asarray(rng.integers(-100, 100, (1024, 128)), jnp.int8)
big = jnp.asarray(rng.integers(-100, 100, (786432, 128)), jnp.int8)
bigb = jnp.asarray(rng.standard_normal((786432, 128)), jnp.bfloat16)

scan_time("pallas 128KB reduce (1 grid step)",
          lambda b, t: pallas_sum(b, t, blk_rows=1024),
          biases, consts=(tiny,), bytes_=tiny.size)
scan_time("pallas 100MB int8 reduce rows=16384 (48 steps)",
          lambda b, t: pallas_sum(b, t, blk_rows=16384),
          biases, consts=(big,), bytes_=big.size)
scan_time("pallas 100MB int8 reduce rows=49152 (16 steps)",
          lambda b, t: pallas_sum(b, t, blk_rows=49152),
          biases, consts=(big,), bytes_=big.size)
scan_time("pallas 201MB bf16 reduce rows=16384 (48 steps)",
          lambda b, t: pallas_sum(b, t, blk_rows=16384),
          biases, consts=(bigb,), bytes_=bigb.size * 2)
scan_time("pallas 2x 128KB calls per step",
          lambda b, t: pallas_sum(b, t, blk_rows=1024)
          + pallas_sum(b + 1, t, blk_rows=1024),
          biases, consts=(tiny,), bytes_=2 * tiny.size)
scan_time("pallas 8x 128KB calls per step",
          lambda b, t: sum(pallas_sum(b + i, t, blk_rows=1024)
                           for i in range(8)),
          biases, consts=(tiny,), bytes_=8 * tiny.size)
print("DONE", flush=True)
