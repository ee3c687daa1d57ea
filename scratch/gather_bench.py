"""Gather + compaction strategy bench for the sampled decode path.

Variants:
  g1. XLA per-head row gather (current)           [HKV] x N rows of [S, D]
  g2. XLA flat gather (global ids over HKV*S)
  g3. XLA gather with fused KV rows (D*2 wide)
  g4. XLA gather with sorted ids
  g5. Pallas DMA gather, 1 row per DMA, pipelined
  g6. Pallas DMA gather, 4-row segments
  c1. block-local compaction: top_k(128->32) batched
  c2. global top_k over block-compacted [8, 24000] k=8192
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 96 * 1024
HKV, D = 8, 128
N = 8192  # rows per head

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
ids = [jnp.asarray(rng.integers(0, S, (HKV, N)), jnp.int32) for _ in range(4)]
ids_sorted = [jnp.sort(i, axis=-1) for i in ids]
gbytes = HKV * N * D * 2

# g1: per-head vmap gather
timeit("g1 XLA per-head gather",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii])(kc, i)),
       [(kv[i % 2], ids[i % 4]) for i in range(4)], bytes_=gbytes)

# g2: flat gather
kvf = [k.reshape(HKV * S, D) for k in kv]
base = (jnp.arange(HKV, dtype=jnp.int32) * S)[:, None]
idsf = [(i + base).reshape(-1) for i in ids]
timeit("g2 XLA flat gather",
       jax.jit(lambda kc, i: kc[i]),
       [(kvf[i % 2], idsf[i % 4]) for i in range(4)], bytes_=gbytes)

# g3: fused KV rows (512B rows)
kv2 = [jnp.concatenate([kv[0], kv[1]], axis=-1),
       jnp.concatenate([kv[1], kv[0]], axis=-1)]
timeit("g3 XLA gather 2D-wide rows",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii])(kc, i)),
       [(kv2[i % 2], ids[i % 4]) for i in range(4)], bytes_=2 * gbytes)

# g4: sorted ids
timeit("g4 XLA per-head gather sorted ids",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii])(kc, i)),
       [(kv[i % 2], ids_sorted[i % 4]) for i in range(4)], bytes_=gbytes)

# g5: Pallas DMA gather, one row per DMA, double-buffered chunks
CHUNK = 256
NBUF = 2


def dma_gather_kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    def issue(slot, chunk_idx):
        for j in range(CHUNK):
            pltpu.make_async_copy(
                hbm_ref.at[h, pl.ds(ids_ref[h, chunk_idx * CHUNK + j], 1), :],
                scratch.at[slot, pl.ds(j, 1), :],
                sems.at[slot, j],
            ).start()

    def wait(slot):
        for j in range(CHUNK):
            pltpu.semaphore_wait(sems.at[slot, j], 1)

    @pl.when(c == 0)
    def _():
        issue(0, 0)

    @pl.when(c + 1 < nc)
    def _():
        issue((c + 1) % NBUF, c + 1)

    wait(c % NBUF)
    out_ref[:] = scratch[c % NBUF]


def pallas_gather(kc, i):
    grid = (HKV, N // CHUNK)
    return pl.pallas_call(
        dma_gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, CHUNK, D), lambda h, c, ids: (h, c, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, CHUNK, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NBUF, CHUNK)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, N, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i, kc)


try:
    timeit("g5 Pallas DMA row gather", jax.jit(pallas_gather),
           [(kv[i % 2], ids[i % 4]) for i in range(4)], bytes_=gbytes)
except Exception as e:
    print(f"g5 FAILED: {type(e).__name__}: {str(e)[:300]}")

# g6: 4-row segment gather (ids quantized to segments of 4)
SEG = 4
NSEG = N // 2  # half as many segments as rows (covers ~2x tokens)


def dma_seg_kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    CH = 64  # segments per chunk

    def issue(slot, chunk_idx):
        for j in range(CH):
            sid = ids_ref[h, chunk_idx * CH + j]
            pltpu.make_async_copy(
                hbm_ref.at[h, pl.ds(sid * SEG, SEG), :],
                scratch.at[slot, pl.ds(j * SEG, SEG), :],
                sems.at[slot, j],
            ).start()

    def wait(slot):
        for j in range(CH):
            pltpu.semaphore_wait(sems.at[slot, j], 1)

    @pl.when(c == 0)
    def _():
        issue(0, 0)

    @pl.when(c + 1 < nc)
    def _():
        issue((c + 1) % NBUF, c + 1)

    wait(c % NBUF)
    out_ref[:] = scratch[c % NBUF]


def pallas_seg_gather(kc, i):
    CH = 64
    grid = (HKV, NSEG // CH)
    return pl.pallas_call(
        dma_seg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, CH * SEG, D), lambda h, c, ids: (h, c, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, CH * SEG, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NBUF, CH)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, NSEG * SEG, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i, kc)


seg_ids = [jnp.asarray(rng.integers(0, S // SEG, (HKV, NSEG)), jnp.int32)
           for _ in range(4)]
try:
    timeit("g6 Pallas DMA 4-row segment gather", jax.jit(pallas_seg_gather),
           [(kv[i % 2], seg_ids[i % 4]) for i in range(4)],
           bytes_=HKV * NSEG * SEG * D * 2)
except Exception as e:
    print(f"g6 FAILED: {type(e).__name__}: {str(e)[:300]}")

# c1: block-local compaction
masks = [jnp.asarray(rng.random((HKV, S)) < 0.08, jnp.int8) for _ in range(4)]


@jax.jit
def block_compact(m):
    mb = m.reshape(HKV, S // 128, 128)
    v, i = jax.lax.top_k(mb, 32)  # per-block top 32
    return i.astype(jnp.int32), v


timeit("c1 block-local top_k(128->32)", block_compact,
       [(m,) for m in masks])

# c2: global top_k over compacted 24000
comp = [jnp.asarray(rng.random((HKV, 24000)) < 0.3, jnp.int8) for _ in range(4)]
timeit("c2 top_k [8,24000] k=8192",
       jax.jit(lambda m: jax.lax.top_k(m, 8192)[1]), [(m,) for m in comp])

# c3: single sort-based compaction over full S (ids by desc bit, stable)
timeit("c3 argsort desc [8,96K] int8",
       jax.jit(lambda m: jnp.argsort(-m, axis=-1, stable=True)[:, :8192]),
       [(m,) for m in masks])
