"""Pallas DMA gather variants (fixed wait pattern) + compaction leftovers."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 96 * 1024
HKV, D = 8, 128
N = 8192

rng = np.random.default_rng(0)
print(jax.devices())

_small = jax.jit(lambda x: x + 1)
np.asarray(_small(jnp.zeros((), jnp.int32)))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(_small(jnp.zeros((), jnp.int32)))
RTT = (time.perf_counter() - t0) / 20
print(f"RTT {RTT*1e3:.2f} ms")


def timeit(name, fn, variants, n=16, bytes_=None):
    red = jax.jit(lambda r: jax.tree.leaves(r)[0].ravel()[0])
    np.asarray(red(fn(*variants[0])))
    np.asarray(red(fn(*variants[1 % len(variants)])))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = fn(*variants[i % len(variants)])
    np.asarray(red(r))
    dt = (time.perf_counter() - t0 - RTT) / n
    extra = f"  {bytes_/dt/1e9:8.1f} GB/s" if bytes_ else ""
    print(f"{name:46s} {dt*1e3:8.3f} ms{extra}")
    return dt


kv = [jnp.asarray(rng.standard_normal((HKV, S, D)), jnp.bfloat16)
      for _ in range(2)]
gbytes = HKV * N * D * 2


def make_row_gather(chunk, nbuf=2):
    def kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
        h = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        def dma(slot, chunk_idx, j):
            return pltpu.make_async_copy(
                hbm_ref.at[h, pl.ds(ids_ref[h, chunk_idx * chunk + j], 1), :],
                scratch.at[slot, pl.ds(j, 1), :],
                sems.at[slot, j],
            )

        def issue(slot, chunk_idx):
            for j in range(chunk):
                dma(slot, chunk_idx, j).start()

        @pl.when(c == 0)
        def _():
            issue(0, 0)

        @pl.when(c + 1 < nc)
        def _():
            issue((c + 1) % nbuf, c + 1)

        slot = c % nbuf
        for j in range(chunk):
            dma(slot, c, j).wait()
        out_ref[0] = scratch[slot]

    def run(kc, i):
        grid = (HKV, N // chunk)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (1, chunk, D), lambda h, c, ids: (h, c, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, chunk, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbuf, chunk)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((HKV, N, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, kc)

    return run


ids = [jnp.asarray(rng.integers(0, S, (HKV, N)), jnp.int32) for _ in range(4)]
for chunk in (128, 512):
    try:
        timeit(f"g5 Pallas row gather chunk={chunk}",
               jax.jit(make_row_gather(chunk)),
               [(kv[i % 2], ids[i % 4]) for i in range(4)], bytes_=gbytes)
    except Exception as e:
        print(f"g5 chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:200]}")


def make_seg_gather(seg, nseg, chunk, nbuf=2):
    """Gather `nseg` segments of `seg` consecutive rows per head."""
    def kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
        h = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        def dma(slot, chunk_idx, j):
            sid = ids_ref[h, chunk_idx * chunk + j]
            return pltpu.make_async_copy(
                hbm_ref.at[h, pl.ds(sid * seg, seg), :],
                scratch.at[slot, pl.ds(j * seg, seg), :],
                sems.at[slot, j],
            )

        def issue(slot, chunk_idx):
            for j in range(chunk):
                dma(slot, chunk_idx, j).start()

        @pl.when(c == 0)
        def _():
            issue(0, 0)

        @pl.when(c + 1 < nc)
        def _():
            issue((c + 1) % nbuf, c + 1)

        slot = c % nbuf
        for j in range(chunk):
            dma(slot, c, j).wait()
        out_ref[0] = scratch[slot]

    def run(kc, i):
        grid = (HKV, nseg // chunk)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (1, chunk * seg, D), lambda h, c, ids: (h, c, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, chunk * seg, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbuf, chunk)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((HKV, nseg * seg, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, kc)

    return run


for seg, nseg in ((4, 4096), (8, 2048), (8, 4096)):
    sids = [jnp.asarray(rng.integers(0, S // seg, (HKV, nseg)), jnp.int32)
            for _ in range(4)]
    try:
        timeit(f"g6 Pallas seg gather seg={seg} nseg={nseg}",
               jax.jit(make_seg_gather(seg, nseg, 128)),
               [(kv[i % 2], sids[i % 4]) for i in range(4)],
               bytes_=HKV * nseg * seg * D * 2)
    except Exception as e:
        print(f"g6 seg={seg} FAILED: {type(e).__name__}: {str(e)[:200]}")

# c2/c3 from before
comp = [jnp.asarray(rng.random((HKV, 24000)) < 0.3, jnp.int8) for _ in range(4)]
timeit("c2 top_k [8,24000] k=8192",
       jax.jit(lambda m: jax.lax.top_k(m, 8192)[1]), [(m,) for m in comp])

masks = [jnp.asarray(rng.random((HKV, S)) < 0.08, jnp.int8) for _ in range(4)]
timeit("c3 argsort desc [8,96K] int8",
       jax.jit(lambda m: jnp.argsort(-m, axis=-1, stable=True)[:, :8192]),
       [(m,) for m in masks])

# c4: cumsum-based packed compaction cost probe: cumsum over [8, 96K] int32
wrds = [jnp.asarray(rng.integers(0, 1 << 30, (HKV, 3072)), jnp.int32)
        for _ in range(4)]
timeit("c4 popcount+cumsum [8,3072] words",
       jax.jit(lambda w: jnp.cumsum(
           jax.lax.population_count(w), axis=-1)), [(w,) for w in wrds])
