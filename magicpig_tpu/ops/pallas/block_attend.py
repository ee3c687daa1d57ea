"""Pallas attention over top-ranked blocks (the block_topk consumer).

Given block-major scores (`ops.pallas.score.exact_scores_blocks`) and the
per-kv-head list of selected block ids, attends over exactly those blocks.
The grid is one step per (request, kv-head); inside, the kernel streams the
selected score/V/scale blocks with double-buffered async DMAs addressed by
the scalar-prefetched ids. (Two earlier designs measured slower: XLA gather
moves the bytes at ~10 GB/s, and a one-grid-step-per-block Pallas kernel
pays ~1.8 us of grid overhead per 32 KB block — 2.2 ms/layer at a 60-block
budget.)

V may be int8 (token-folded storage) with per-token scales. The V scale
multiplies `p` instead of V (identical math: out = sum_r (p_r*scale_r) v_r)
so it rides the 128-lane score order and every DMA stays tile-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_NBUF = 2


def _kernel(ids_ref, s_hbm, v_hbm, vs_hbm, o_ref, lse_ref,
            sbuf, vbuf, vsbuf, sems, m_ref, l_ref, acc_ref, *,
            fold: int, d: int, quant: bool, nbp: int, ch: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    g = m_ref.shape[0]
    nchunks = nbp // ch

    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, ci, j):
        nb = ids_ref[b, h, ci * ch + j]
        ops = [pltpu.make_async_copy(s_hbm.at[b, h, nb],
                                     sbuf.at[slot, j], sems.at[slot, j, 0]),
               pltpu.make_async_copy(v_hbm.at[b, h, nb],
                                     vbuf.at[slot, j], sems.at[slot, j, 1])]
        if quant:
            ops.append(pltpu.make_async_copy(
                vs_hbm.at[b, h, nb], vsbuf.at[slot, j],
                sems.at[slot, j, 2]))
        return ops

    def issue(slot, ci):
        for j in range(ch):
            for op in dmas(slot, ci, j):
                op.start()

    def wait(slot, ci):
        for j in range(ch):
            for op in dmas(slot, ci, j):
                op.wait()

    issue(0, 0)

    def body(ci, _):
        slot = ci % _NBUF

        @pl.when(ci + 1 < nchunks)
        def _():
            issue((ci + 1) % _NBUF, ci + 1)

        wait(slot, ci)
        rows = sbuf.shape[-1] // fold
        for j in range(ch):
            v = vbuf[slot, j]                           # [rows, lane]
            for f in range(fold):
                s = sbuf[slot, j, :, f * rows:(f + 1) * rows]  # [G, rows]
                m_prev = m_ref[:]
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
                p = jnp.exp(s - m_new[:, :1])           # -inf scores -> 0
                l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                vs = v[:, f * d:(f + 1) * d]            # [rows, d] (int8 ok)
                if quant:
                    # scale rides p (lane-aligned); same math as scaling V.
                    scale = vsbuf[slot, j, :, f * rows:(f + 1) * rows]
                    pw = p * scale                      # [G, rows]
                else:
                    pw = p
                pv = jax.lax.dot_general(
                    pw.astype(jnp.bfloat16), vs.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[:] = acc_ref[:] * alpha + pv
                m_ref[:] = m_new
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    l = l_ref[:, :1]
    safe = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
    m = m_ref[:, :1]
    lse = jnp.where(l > 0, m + jnp.log(safe), -jnp.inf)
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _io(b, h, ids):
    return (b, h, 0, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def block_attend(scores_blocks: jax.Array, blk_ids: jax.Array, v: jax.Array,
                 v_scale: jax.Array | None, block_size: int,
                 interpret: bool = False):
    """Attention over selected blocks.

    scores_blocks: [B, Hkv, NB, G, block_size] f32 (already scaled and
    length-masked with -inf; lane order per exact_scores_blocks);
    blk_ids: [B, Hkv, NB'] int32 selected block indices;
    v: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128] (int8 when
    v_scale [B, Hkv, S] f32 is given).
    Returns (out [B, Hkv*G, d] f32, lse [B, Hkv*G] f32).
    """
    b, hkv, nblk, g, bs = scores_blocks.shape
    assert bs == block_size
    s = nblk * block_size
    nbp = blk_ids.shape[-1]
    ch = max(c for c in (8, 4, 2, 1) if nbp % c == 0)
    quant = v_scale is not None
    d = v.shape[-1] if v.shape[2] == s else v.shape[-1] * v.shape[2] // s
    fold = max(128 // d, 1)
    rows = block_size // fold
    if v.shape[2] == s and fold > 1:   # fold V too (free, row-major view)
        v = v.reshape(b, hkv, s // fold, fold * d)
    lane = v.shape[-1]

    v5 = v.reshape(b, hkv, nblk, rows, lane)
    if quant:
        # Scale in the scores' lane order (l = f*rows + r): one transpose of
        # the small [B,Hkv,S] f32 scale per step (~MBs).
        vs5 = v_scale.astype(jnp.float32).reshape(
            b, hkv, nblk, rows, fold).transpose(0, 1, 2, 4, 3).reshape(
            b, hkv, nblk, 1, block_size)
    else:
        vs5 = jnp.zeros((b, hkv, 1, 1, block_size), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, quant=quant,
                               nbp=nbp, ch=ch)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _io, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((_NBUF, ch, g, block_size), jnp.float32),
                pltpu.VMEM((_NBUF, ch, rows, lane), v.dtype),
                pltpu.VMEM((_NBUF, ch, 1, block_size), jnp.float32),
                pltpu.SemaphoreType.DMA((_NBUF, ch, 3)),
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, g, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(blk_ids.astype(jnp.int32), scores_blocks, v5, vs5)
    return out.reshape(b, hkv * g, d), lse[..., 0].reshape(b, hkv * g)
