"""Pallas attention over top-ranked blocks (the block_topk consumer).

Given fold-major scores (`ops.pallas.score.exact_scores_folded`) and the
per-kv-head list of selected block ids, attends over exactly those blocks.
The grid is one step per (request, kv-head); inside, the kernel streams the
selected score/V/scale blocks with double-buffered async DMAs addressed by
the scalar-prefetched ids — one [G*fold, block/fold] score slice, one
[block/fold, 128] V slice and one [fold, block/fold] V-scale slice per
block. (Two earlier designs measured slower: XLA gather moves the bytes at
~10 GB/s, and a one-grid-step-per-block Pallas kernel pays ~1.8 us of grid
overhead per 32 KB block — 2.2 ms/layer at a 60-block budget.)

Inside the kernel the chunk's softmax statistics are computed over ALL
`ch` buffered blocks in one shot (one max/exp/sum and one ch-batched MXU
dot per fold) — the earlier per-(block, fold) online-update chains cost
~0.8 ms/layer of pure VPU op issue at a 16-block budget.

V may be int8 (token-folded storage) with per-token scales. The V scale
multiplies `p` instead of V (identical math: out = sum_r (p_r*scale_r) v_r)
so it rides the score layout and every DMA stays tile-aligned.
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
            fold: int, d: int, g: int, quant: bool, nbp: int, ch: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    nchunks = nbp // ch
    rows = sbuf.shape[-1]

    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, ci, j):
        nb = ids_ref[b, h, ci * ch + j]
        # One [GF, rows] lane slice of the fold-major scores per block; the
        # dynamic lane offset nb*rows stays 128-aligned (rows % 128 == 0
        # asserted at the wrapper).
        ops = [pltpu.make_async_copy(
                   s_hbm.at[b, h, :, pl.ds(nb * rows, rows)],
                   sbuf.at[slot, j], sems.at[slot, j, 0]),
               pltpu.make_async_copy(v_hbm.at[b, h, nb],
                                     vbuf.at[slot, j],
                                     sems.at[slot, j, 1])]
        if quant:
            # Same lane-slice addressing as the scores: the V scale is
            # stored fold-major [B, Hkv, fold, S/fold].
            ops.append(pltpu.make_async_copy(
                vs_hbm.at[b, h, :, pl.ds(nb * rows, rows)],
                vsbuf.at[slot, j], sems.at[slot, j, 2]))
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
        # Chunk-batched online softmax: ONE max/exp/sum over all ch blocks,
        # then one ch-batched MXU dot per fold. Rows f*G + g of the score
        # slice belong to query head g; the per-head stats reduce the fold
        # row-groups with G-sublane slices.
        s_all = sbuf[pl.ds(slot, 1)][0]                 # [ch, GF, rows] f32
        m_prev = m_ref[:]                               # [G, 128]
        mrow = jnp.max(jnp.max(s_all, axis=0), axis=-1,
                       keepdims=True)                   # [GF, 1]
        mg = mrow[:g]
        for f in range(1, fold):
            mg = jnp.maximum(mg, mrow[f * g:(f + 1) * g])
        m_new = jnp.maximum(m_prev, mg)                 # [G, 128]
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
        m8 = jnp.concatenate([m_new[:, :1]] * fold, axis=0)  # [GF, 1]
        p = jnp.exp(s_all - m8)                         # [ch, GF, rows]
        lrow = jnp.sum(jnp.sum(p, axis=0), axis=-1,
                       keepdims=True)                   # [GF, 1]
        lg = lrow[:g]
        for f in range(1, fold):
            lg = lg + lrow[f * g:(f + 1) * g]
        l_ref[:] = l_ref[:] * alpha + lg
        pv = jnp.zeros_like(acc_ref)
        for f in range(fold):
            pf = p[:, f * g:(f + 1) * g, :]             # [ch, G, rows]
            if quant:
                pf = pf * vsbuf[pl.ds(slot, 1)][0][:, f:f + 1, :]
            vf = vbuf[pl.ds(slot, 1)][0][:, :, f * d:(f + 1) * d]
            out = jax.lax.dot_general(
                pf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # [ch, G, d]
            pv = pv + jnp.sum(out, axis=0)
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


@functools.partial(jax.jit, static_argnames=("block_size", "head_dim",
                                             "interpret"))
def block_attend(scores_folded: jax.Array, blk_ids: jax.Array, v: jax.Array,
                 v_scale: jax.Array | None, block_size: int, head_dim: int,
                 interpret: bool = False):
    """Attention over selected blocks.

    scores_folded: [B, Hkv, G*fold, S/fold] f32 (already scaled and
    length-masked with -inf; [.., f*G+g, c] scores token c*fold + f for
    head g, see exact_scores_folded);
    blk_ids: [B, Hkv, NB'] int32 selected block indices;
    v: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128] (int8 when
    the fold-major v_scale [B, Hkv, fold, S/fold] f32 is given — the
    layout `runtime/state.py` stores; [.., f, c] scales token c*fold + f);
    head_dim: d (static).
    Returns (out [B, Hkv*G, d] f32, lse [B, Hkv*G] f32).
    """
    b, hkv, gf, sf = scores_folded.shape
    nbp = blk_ids.shape[-1]
    ch = max(c for c in (16, 8, 4, 2, 1) if nbp % c == 0)
    quant = v_scale is not None
    d = head_dim
    fold = max(128 // d, 1)
    g = gf // fold
    s = sf * fold
    assert v.shape[2] in (s, sf) and gf % fold == 0, (
        v.shape, scores_folded.shape, head_dim)
    nblk = s // block_size
    rows = block_size // fold
    assert interpret or rows % 128 == 0, (
        "compiled block_attend needs block_size/fold % 128 == 0 "
        f"(got block_size={block_size}, fold={fold})")
    if v.shape[2] == s and fold > 1:   # fold V too (free, row-major view)
        v = v.reshape(b, hkv, s // fold, fold * d)
    lane = v.shape[-1]

    v5 = v.reshape(b, hkv, nblk, rows, lane)
    if quant:
        assert v_scale.shape == (b, hkv, fold, sf), v_scale.shape
        vs6 = v_scale.astype(jnp.float32)
    else:
        vs6 = jnp.zeros((b, hkv, fold, sf), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, g=g, quant=quant,
                               nbp=nbp, ch=ch)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _io, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((_NBUF, ch, gf, rows), jnp.float32),
                pltpu.VMEM((_NBUF, ch, rows, lane), v.dtype),
                pltpu.VMEM((_NBUF, ch, fold, rows), jnp.float32),
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
    )(blk_ids.astype(jnp.int32), scores_folded, v5, vs6)
    return out.reshape(b, hkv * g, d), lse[..., 0].reshape(b, hkv * g)
