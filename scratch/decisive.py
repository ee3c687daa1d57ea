"""The decisive measurement set for the sampled-decode redesign, with
strictly unique inputs per call. Shapes: S=96K, HKV=8, G=4, L=150, K=10,
d=128 (llama-3.1-8b head_dim)."""
import sys

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scratch")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_util import timeit

S = 96 * 1024
HKV, G, D = 8, 4, 128
HQ = HKV * G
L, K = 150, 10
W = S // 32
N = 9  # timed iterations per case

rng = np.random.default_rng(0)
print(jax.devices())

# 0. calibration matmul
aa = [jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
      for _ in range(4)]
bb = [jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
      for _ in range(N + 1)]
timeit("matmul 8192^3 bf16", jax.jit(lambda a, b: a @ b),
       [(aa[i % 4], bb[i]) for i in range(N + 1)], flops=2 * 8192**3)

# 1. bit-plane scan (planes fixed, q_bits unique per call)
planes = jnp.asarray(
    rng.integers(-(1 << 31), (1 << 31) - 1, (HKV, L, K, W)), jnp.int32)
qbs = [jnp.asarray(rng.integers(0, 2, (HQ, L, K)), jnp.int32)
       for _ in range(N + 1)]


@jax.jit
def mask_planes(qb, pls):
    qsel = (qb - 1).reshape(HKV, G, L, K, 1)
    m = pls[:, None] ^ qsel
    m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (3,))
    once = jnp.zeros((HKV, G, W), jnp.int32)
    twice = jnp.zeros((HKV, G, W), jnp.int32)

    def body(l, ab):
        a, b = ab
        ml = jax.lax.dynamic_index_in_dim(m, l, 2, keepdims=False)
        return (a | ml, b | (a & ml))

    once, twice = jax.lax.fori_loop(0, L, body, (once, twice))
    return twice


timeit("bit-plane scan mask", mask_planes, [(q, planes) for q in qbs],
       bytes_=planes.size * 4)

# 2. int16 mask (for reference)
k_codes = jnp.asarray(rng.integers(0, 1 << K, (HKV, L, S)), jnp.int16)
qcs = [jnp.asarray(rng.integers(0, 1 << K, (HQ, L)), jnp.int16)
       for _ in range(N + 1)]


@jax.jit
def mask_int16(qc, kc):
    qcr = qc.reshape(HKV, G, L, 1)
    cnt = jnp.sum((qcr == kc[:, None]).astype(jnp.int16), axis=2,
                  dtype=jnp.int16)
    return cnt >= 2


timeit("int16 code-compare mask", mask_int16,
       [(q, k_codes) for q in qcs], bytes_=k_codes.size * 2)

# 3. compaction: argsort desc over union mask [HKV, S]
masks = [jnp.asarray(rng.random((HKV, S)) < 0.08, jnp.int8)
         for _ in range(N + 1)]
timeit("argsort compaction [8,96K] -> 8192",
       jax.jit(lambda m: jnp.argsort(-m, axis=-1, stable=True)[:, :8192]),
       [(m,) for m in masks])

# 3b. top_k over int8
timeit("top_k [8,96K] k=8192 int8",
       jax.jit(lambda m: jax.lax.top_k(m, 8192)[1]),
       [(m,) for m in masks])

# 4. XLA per-head gather (unique ids)
kv = jnp.asarray(rng.standard_normal((HKV, S, D)), jnp.bfloat16)
idss = [jnp.asarray(rng.integers(0, S, (HKV, 8192)), jnp.int32)
        for _ in range(N + 1)]
gbytes = HKV * 8192 * D * 2
timeit("XLA per-head gather 8x8192 rows d128",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii])(kc, i)),
       [(kv, i) for i in idss], bytes_=gbytes)

# 5. Pallas row gather, chunk=256 (unique ids)
CHUNK = 256
NBUF = 2


def row_kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    def dma(slot, chunk_idx, j):
        return pltpu.make_async_copy(
            hbm_ref.at[h, pl.ds(ids_ref[h, chunk_idx * CHUNK + j], 1), :],
            scratch.at[slot, pl.ds(j, 1), :],
            sems.at[slot, j],
        )

    def issue(slot, chunk_idx):
        for j in range(CHUNK):
            dma(slot, chunk_idx, j).start()

    @pl.when(c == 0)
    def _():
        issue(0, 0)

    @pl.when(c + 1 < nc)
    def _():
        issue((c + 1) % NBUF, c + 1)

    slot = c % NBUF
    for j in range(CHUNK):
        dma(slot, c, j).wait()
    out_ref[0] = scratch[slot]


def pallas_row_gather(kc, i):
    grid = (HKV, 8192 // CHUNK)
    return pl.pallas_call(
        row_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, CHUNK, D), lambda h, c, ids: (h, c, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, CHUNK, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NBUF, CHUNK)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, 8192, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i, kc)


try:
    timeit("Pallas row gather 8x8192 d128", jax.jit(pallas_row_gather),
           [(kv, i) for i in idss], bytes_=gbytes)
except Exception as e:
    print(f"Pallas row gather FAILED: {type(e).__name__}: {str(e)[:200]}")

# 6. Pallas segment gather seg=8 (unique seg ids), 1024 segs/head = 8192 rows
SEG = 8
NSEG = 1024
CH = 128


def seg_kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    def dma(slot, chunk_idx, j):
        sid = ids_ref[h, chunk_idx * CH + j]
        return pltpu.make_async_copy(
            hbm_ref.at[h, pl.ds(sid * SEG, SEG), :],
            scratch.at[slot, pl.ds(j * SEG, SEG), :],
            sems.at[slot, j],
        )

    def issue(slot, chunk_idx):
        for j in range(CH):
            dma(slot, chunk_idx, j).start()

    @pl.when(c == 0)
    def _():
        issue(0, 0)

    @pl.when(c + 1 < nc)
    def _():
        issue((c + 1) % NBUF, c + 1)

    slot = c % NBUF
    for j in range(CH):
        dma(slot, c, j).wait()
    out_ref[0] = scratch[slot]


def pallas_seg_gather(kc, i):
    grid = (HKV, NSEG // CH)
    return pl.pallas_call(
        seg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, CH * SEG, D),
                                   lambda h, c, ids: (h, c, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, CH * SEG, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NBUF, CH)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, NSEG * SEG, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i, kc)


sidss = [jnp.asarray(rng.integers(0, S // SEG, (HKV, NSEG)), jnp.int32)
         for _ in range(N + 1)]
try:
    timeit("Pallas seg8 gather 8x1024seg d128", jax.jit(pallas_seg_gather),
           [(kv, i) for i in sidss], bytes_=HKV * NSEG * SEG * D * 2)
except Exception as e:
    print(f"Pallas seg gather FAILED: {type(e).__name__}: {str(e)[:200]}")

# 7. dense decode partial (the baseline to beat), unique q
qs = [jnp.asarray(rng.standard_normal((1, HQ, D)), jnp.bfloat16)
      for _ in range(N + 1)]
kc4 = kv[None]


@jax.jit
def dense_partial(q, k, v):
    qh = q.reshape(1, HKV, G, D)
    s = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                   preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    o = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o / jnp.sum(p, axis=-1, keepdims=True)


timeit("dense decode partial 96K d128 (baseline)", dense_partial,
       [(q, kc4, kc4) for q in qs], bytes_=2 * kv.size * 2)

# 8. gathered attention over [8, 8192, D] compacted rows (post-gather cost)
gk = [jnp.asarray(rng.standard_normal((HKV, 8192, D)), jnp.bfloat16)
      for _ in range(2)]


@jax.jit
def gathered_attn(q, kg, vg):
    qh = q.reshape(1, HKV, G, D)
    s = jnp.einsum("bhgd,hsd->bhgs", qh, kg,
                   preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    o = jnp.einsum("bhgs,hsd->bhgd", p.astype(vg.dtype), vg,
                   preferred_element_type=jnp.float32)
    return o / jnp.sum(p, axis=-1, keepdims=True)


timeit("gathered attention 8x8192 d128", gathered_attn,
       [(q, gk[0], gk[1]) for q in qs])
