"""Round 2 decisive measurements:
  a. Pallas dense flash-decode kernel (the honest baseline speed)
  b. Pallas row gather with deeper DMA pipelining (nbuf x chunk sweep)
  c. restructured bit-plane mask (XOR inside L-loop, no big temp)
"""
import functools
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
N = 9

rng = np.random.default_rng(0)
print(jax.devices())

kv = jnp.asarray(rng.standard_normal((HKV, S, D)), jnp.bfloat16)
qs = [jnp.asarray(rng.standard_normal((HKV, G, D)), jnp.bfloat16)
      for _ in range(N + 1)]

# --- a. Pallas dense flash-decode --------------------------------------------
BLK = 2048


def flash_decode_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # [G, D]
    k = k_ref[0]                                   # [BLK, D]
    v = v_ref[0]                                   # [BLK, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [G, BLK]
    m_prev = m_ref[:]                              # [G, 128] (bcast cols)
    m_cur = jnp.max(s, axis=-1, keepdims=True)     # [G, 1]
    m_new = jnp.maximum(m_prev, m_cur)             # [G, 128]
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # [G, 1]
    p = jnp.exp(s - m_new[:, :1])                  # [G, BLK]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [G, D]
    m_ref[:] = m_new

    @pl.when(c == nc - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@jax.jit
def flash_decode(q, k, v):
    grid = (HKV, S // BLK)
    return pl.pallas_call(
        flash_decode_kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, G, D), lambda h, c: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK, D), lambda h, c: (h, c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK, D), lambda h, c: (h, c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, D), lambda h, c: (h, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, G, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )(q, k, v)


try:
    timeit("Pallas flash-decode dense 96K d128", flash_decode,
           [(q, kv, kv) for q in qs], bytes_=2 * kv.size * 2)
except Exception as e:
    print(f"flash-decode FAILED: {type(e).__name__}: {str(e)[:300]}")

# --- b. row gather sweep ------------------------------------------------------
NROW = 8192


def make_row_gather(chunk, nbuf):
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
            for b in range(nbuf - 1):
                issue(b, b)

        @pl.when(c + nbuf - 1 < nc)
        def _():
            issue((c + nbuf - 1) % nbuf, c + nbuf - 1)

        slot = c % nbuf
        for j in range(chunk):
            dma(slot, c, j).wait()
        out_ref[0] = scratch[slot]

    def run(kc, i):
        grid = (HKV, NROW // chunk)
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
            out_shape=jax.ShapeDtypeStruct((HKV, NROW, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, kc)

    return run


idss = [jnp.asarray(rng.integers(0, S, (HKV, NROW)), jnp.int32)
        for _ in range(N + 1)]
for chunk, nbuf in ((128, 2), (128, 4), (64, 8)):
    try:
        timeit(f"Pallas row gather chunk={chunk} nbuf={nbuf}",
               jax.jit(make_row_gather(chunk, nbuf)),
               [(kv, i) for i in idss], bytes_=HKV * NROW * D * 2)
    except Exception as e:
        print(f"row chunk={chunk} nbuf={nbuf} FAILED: "
              f"{type(e).__name__}: {str(e)[:160]}")

# --- c. restructured bit-plane mask -------------------------------------------
planes = jnp.asarray(
    rng.integers(-(1 << 31), (1 << 31) - 1, (HKV, L, K, W)), jnp.int32)
qbs = [jnp.asarray(rng.integers(0, 2, (HQ, L, K)), jnp.int32)
       for _ in range(N + 1)]


@jax.jit
def mask_planes_v2(qb, pls):
    qsel = (qb - 1).reshape(HKV, G, L, K)

    def body(l, ab):
        a, b = ab
        pl_l = jax.lax.dynamic_index_in_dim(pls, l, 1, keepdims=False)  # [HKV,K,W]
        qs_l = jax.lax.dynamic_index_in_dim(qsel, l, 2, keepdims=False)  # [HKV,G,K]
        m = pl_l[:, None] ^ qs_l[..., None]        # [HKV,G,K,W]
        m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (2,))
        return (a | m, b | (a & m))

    a0 = jnp.zeros((HKV, G, W), jnp.int32)
    b0 = jnp.zeros((HKV, G, W), jnp.int32)
    _, twice = jax.lax.fori_loop(0, L, body, (a0, b0))
    return twice


timeit("bit-plane mask v2 (slice in loop)", mask_planes_v2,
       [(q, planes) for q in qbs], bytes_=planes.size * 4)


# unrolled variant (static python loop over L)
@jax.jit
def mask_planes_v3(qb, pls):
    qsel = (qb - 1).reshape(HKV, G, L, K)
    a = jnp.zeros((HKV, G, W), jnp.int32)
    b = jnp.zeros((HKV, G, W), jnp.int32)
    for l in range(L):
        m = pls[:, l][:, None] ^ qsel[:, :, l][..., None]  # [HKV,G,K,W]
        m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (2,))
        a, b = a | m, b | (a & m)
    return b


timeit("bit-plane mask v3 (unrolled)", mask_planes_v3,
       [(q, planes) for q in qbs], bytes_=planes.size * 4)
