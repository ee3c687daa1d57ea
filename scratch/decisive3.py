"""Round 3: (a) fixed Pallas flash-decode baseline, (b) DMA-rate scaling with
outstanding-buffer depth (latency-bound vs descriptor-bound)."""
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
N = 9
rng = np.random.default_rng(0)
print(jax.devices())

kv = jnp.asarray(rng.standard_normal((HKV, S, D)), jnp.bfloat16)
qs = [jnp.asarray(rng.standard_normal((HKV, G, D)), jnp.bfloat16)
      for _ in range(N + 1)]

# --- a. Pallas dense flash-decode (scratch via pallas_call kwarg) ------------
BLK = 2048


def flash_decode_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [G, BLK]
    m_prev = m_ref[:]                                  # [G, 128]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
    p = jnp.exp(s - m_new[:, :1])
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(c == nc - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@jax.jit
def flash_decode(q, k, v):
    return pl.pallas_call(
        flash_decode_kernel,
        grid=(HKV, S // BLK),
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

# --- b. seg8 gather: nbuf sweep ------------------------------------------------
SEG = 8
NSEG = 1024


def make_seg_gather(ch, nbuf):
    def kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
        h = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        def dma(slot, chunk_idx, j):
            sid = ids_ref[h, chunk_idx * ch + j]
            return pltpu.make_async_copy(
                hbm_ref.at[h, pl.ds(sid * SEG, SEG), :],
                scratch.at[slot, pl.ds(j * SEG, SEG), :],
                sems.at[slot, j],
            )

        def issue(slot, chunk_idx):
            for j in range(ch):
                dma(slot, chunk_idx, j).start()

        @pl.when(c == 0)
        def _():
            for b in range(nbuf - 1):
                issue(b, b)

        @pl.when(c + nbuf - 1 < nc)
        def _():
            issue((c + nbuf - 1) % nbuf, c + nbuf - 1)

        slot = c % nbuf
        for j in range(ch):
            dma(slot, c, j).wait()
        out_ref[0] = scratch[slot]

    def run(kc, i):
        grid = (HKV, NSEG // ch)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (1, ch * SEG, D), lambda h, c, ids: (h, c, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, ch * SEG, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbuf, ch)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((HKV, NSEG * SEG, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, kc)

    return run


sidss = [jnp.asarray(rng.integers(0, S // SEG, (HKV, NSEG)), jnp.int32)
         for _ in range(N + 1)]
for ch, nbuf in ((128, 2), (128, 4), (256, 2), (64, 8)):
    try:
        timeit(f"seg8 gather ch={ch} nbuf={nbuf}",
               jax.jit(make_seg_gather(ch, nbuf)),
               [(kv, i) for i in sidss], bytes_=HKV * NSEG * SEG * D * 2)
    except Exception as e:
        print(f"seg8 ch={ch} nbuf={nbuf} FAILED: "
              f"{type(e).__name__}: {str(e)[:160]}")

# --- c. seg16 gather (half the DMAs, same bytes) -------------------------------
SEG2 = 16
NSEG2 = 512


def seg16_kernel(ids_ref, hbm_ref, out_ref, scratch, sems):
    h = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    CH = 64

    def dma(slot, chunk_idx, j):
        sid = ids_ref[h, chunk_idx * CH + j]
        return pltpu.make_async_copy(
            hbm_ref.at[h, pl.ds(sid * SEG2, SEG2), :],
            scratch.at[slot, pl.ds(j * SEG2, SEG2), :],
            sems.at[slot, j],
        )

    @pl.when(c == 0)
    def _():
        for j in range(64):
            dma(0, 0, j).start()

    @pl.when(c + 1 < nc)
    def _():
        for j in range(64):
            dma((c + 1) % 2, c + 1, j).start()

    slot = c % 2
    for j in range(64):
        dma(slot, c, j).wait()
    out_ref[0] = scratch[slot]


def seg16_gather(kc, i):
    CH = 64
    grid = (HKV, NSEG2 // CH)
    return pl.pallas_call(
        seg16_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, CH * SEG2, D), lambda h, c, ids: (h, c, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, CH * SEG2, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 64)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, NSEG2 * SEG2, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i, kc)


sids16 = [jnp.asarray(rng.integers(0, S // SEG2, (HKV, NSEG2)), jnp.int32)
          for _ in range(N + 1)]
try:
    timeit("seg16 gather ch=64 nbuf=2", jax.jit(seg16_gather),
           [(kv, i) for i in sids16], bytes_=HKV * NSEG2 * SEG2 * D * 2)
except Exception as e:
    print(f"seg16 FAILED: {type(e).__name__}: {str(e)[:160]}")
