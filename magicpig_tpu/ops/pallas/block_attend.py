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


def online_update(s_all, vslot, vsslot, m_ref, l_ref, acc_ref, *,
                  fold: int, g: int, d: int, quant: bool, pk: int):
    """Chunk-batched online softmax + V accumulation (shared with
    `rescore_attend`): ONE max/exp/sum over all ch buffered blocks, then
    one ch-batched MXU dot per group. Rows i*G + g of the score slice
    belong to query head g; the per-head stats reduce the ng row-groups
    with G-sublane slices. Group i = hlf*fold + f maps to the block's
    folded V rows hlf*rows..(hlf+1)*rows at fold slot f (hlf always 0
    unpacked; packed layout in ops/pack4.py).

    s_all: [ch, ng*G, rows] f32 scores (-inf masked);
    vslot: [ch, vrows, lane] V blocks; vsslot: [ch, fold, vrows] f32 or
    None; m/l/acc refs: [G, 128]/[G, 128]/[G, d] VMEM state.
    """
    ng = pk * fold
    rows = s_all.shape[-1]
    m_prev = m_ref[:]                               # [G, 128]
    mrow = jnp.max(jnp.max(s_all, axis=0), axis=-1,
                   keepdims=True)                   # [ng*G, 1]
    mg = mrow[:g]
    for i in range(1, ng):
        mg = jnp.maximum(mg, mrow[i * g:(i + 1) * g])
    m_new = jnp.maximum(m_prev, mg)                 # [G, 128]
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
    m8 = jnp.concatenate([m_new[:, :1]] * ng, axis=0)    # [ng*G, 1]
    p = jnp.exp(s_all - m8)                         # [ch, ng*G, rows]
    lrow = jnp.sum(jnp.sum(p, axis=0), axis=-1,
                   keepdims=True)                   # [ng*G, 1]
    lg = lrow[:g]
    for i in range(1, ng):
        lg = lg + lrow[i * g:(i + 1) * g]
    l_ref[:] = l_ref[:] * alpha + lg
    pv = jnp.zeros_like(acc_ref)
    for i in range(ng):
        hlf, f = i // fold, i % fold
        pf = p[:, i * g:(i + 1) * g, :]             # [ch, G, rows]
        if quant:
            # Explicit concat instead of a broadcast-multiply: Mosaic
            # rejects vector.broadcast along sublanes when the source
            # slice sits at a non-zero lane offset (hlf=1 in packed
            # mode slices the scale at lane 128 -> "Invalid input
            # layout" on hardware; interpret mode can't catch it).
            vs = vsslot[:, f:f + 1, hlf * rows:(hlf + 1) * rows]
            pf = pf * jnp.concatenate([vs] * g, axis=1)
        vf = vslot[:, hlf * rows:(hlf + 1) * rows, f * d:(f + 1) * d]
        out = jax.lax.dot_general(
            pf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [ch, G, d]
        pv = pv + jnp.sum(out, axis=0)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new


def _kernel(ids_ref, s_hbm, v_hbm, vs_hbm, o_ref, lse_ref,
            sbuf, vbuf, vsbuf, sems, m_ref, l_ref, acc_ref, *,
            fold: int, d: int, g: int, quant: bool, nbp: int, ch: int,
            pk: int = 1):
    b = pl.program_id(0)
    h = pl.program_id(1)
    nchunks = nbp // ch
    rows = sbuf.shape[-1]       # score columns per block (= block/(pk*fold))
    ng = pk * fold              # score row groups (pk=2: packed-int4 layout)

    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, ci, j):
        nb = ids_ref[b, h, ci * ch + j]
        # One [ng*G, rows] lane slice of the group-major scores per block;
        # the dynamic lane offset nb*rows stays 128-aligned (rows % 128 == 0
        # asserted at the wrapper).
        ops = [pltpu.make_async_copy(
                   s_hbm.at[b, h, :, pl.ds(nb * rows, rows)],
                   sbuf.at[slot, j], sems.at[slot, j, 0]),
               pltpu.make_async_copy(v_hbm.at[b, h, nb],
                                     vbuf.at[slot, j],
                                     sems.at[slot, j, 1])]
        if quant:
            # The V scale stays fold-major [B, Hkv, fold, S/fold] even in
            # packed mode (V is never packed); its per-block slice covers
            # the block's vrows = pk*rows folded rows.
            vrows = vsbuf.shape[-1]
            ops.append(pltpu.make_async_copy(
                vs_hbm.at[b, h, :, pl.ds(nb * vrows, vrows)],
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
        s_all = sbuf[pl.ds(slot, 1)][0]                 # [ch, ng*G, rows]
        vslot = vbuf[pl.ds(slot, 1)][0]
        vsslot = vsbuf[pl.ds(slot, 1)][0] if quant else None
        online_update(s_all, vslot, vsslot, m_ref, l_ref, acc_ref,
                      fold=fold, g=g, d=d, quant=quant, pk=pk)
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
                                             "interpret", "packed"))
def block_attend(scores_folded: jax.Array, blk_ids: jax.Array, v: jax.Array,
                 v_scale: jax.Array | None, block_size: int, head_dim: int,
                 interpret: bool = False, packed: bool = False):
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

    `packed=True`: scores arrive in the packed-int4 2*fold-GROUP layout
    [B, Hkv, 2*G*fold, S/(2*fold)] (`ops/pack4.py`; block_size must equal
    the pack span). V and its fold-major scale are UNCHANGED — within each
    block, score group i = hlf*fold + f covers the block's folded V rows
    hlf*half..(hlf+1)*half at fold slot f.
    """
    b, hkv, gfp, sfp = scores_folded.shape
    nbp = blk_ids.shape[-1]
    ch = max(c for c in (16, 8, 4, 2, 1) if nbp % c == 0)
    quant = v_scale is not None
    d = head_dim
    pk = 2 if packed else 1
    fold = max(128 // d, 1)
    g = gfp // (pk * fold)
    s = sfp * fold * pk
    sf = s // fold
    assert v.shape[2] in (s, sf) and gfp % (pk * fold) == 0, (
        v.shape, scores_folded.shape, head_dim)
    if packed:
        from magicpig_tpu.ops.pack4 import SPAN_TOKENS

        assert block_size == SPAN_TOKENS, (block_size, SPAN_TOKENS)
    nblk = s // block_size
    vrows = block_size // fold          # folded V rows per block
    rows = block_size // (pk * fold)    # score columns per block
    assert interpret or rows % 128 == 0, (
        "compiled block_attend needs block_size/(pk*fold) % 128 == 0 "
        f"(got block_size={block_size}, fold={fold}, pk={pk})")
    if v.shape[2] == s and fold > 1:   # fold V too (free, row-major view)
        v = v.reshape(b, hkv, s // fold, fold * d)
    lane = v.shape[-1]

    v5 = v.reshape(b, hkv, nblk, vrows, lane)
    if quant:
        assert v_scale.shape == (b, hkv, fold, sf), v_scale.shape
        vs6 = v_scale.astype(jnp.float32)
    else:
        vs6 = jnp.zeros((b, hkv, fold, sf), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, g=g, quant=quant,
                               nbp=nbp, ch=ch, pk=pk)
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
                pltpu.VMEM((_NBUF, ch, gfp, rows), jnp.float32),
                pltpu.VMEM((_NBUF, ch, vrows, lane), v.dtype),
                pltpu.VMEM((_NBUF, ch, fold, vrows), jnp.float32),
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
