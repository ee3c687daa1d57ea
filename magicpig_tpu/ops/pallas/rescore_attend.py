"""Attention over top-ranked blocks with IN-KERNEL rescoring.

`block_attend` streams pre-computed score slices from HBM; paired with
`score.block_rank` this kernel removes the [B, Hq, S] f32 score round-trip
entirely: pass 1 (`block_rank`) emits only the per-block maxes, and this
kernel recomputes the selected blocks' scores from the SAME quantized K
stream — bit-identical dots, so ranking and attend stay consistent. At
96K/B=5 the score array is ~63 MB/layer/step of HBM writes (plus the
selected re-reads); the rescore re-reads only budget*K bytes (~20x less
at an 8% budget, half again with packed-int4 K).

Per (request, kv-head) grid step the kernel double-buffers per selected
block: the K block (int8 folded, or int4 nibble-packed `ops/pack4.py`),
its fold-major (or 2*fold-group) K scales, the V block (int8 or bf16)
and its fold-major V scales — then computes raw = q2 @ K^T on the MXU,
applies scales + the length mask from the scalar-prefetched per-request
length, and feeds the chunk-batched online softmax shared with
`block_attend` (`online_update`).

Reference mapping: replaces the score+gather phase of the reference's
top-k caches (`evaluations/RULER/pred/topk_cache.py:127-141`) with a
rank-then-rescore pipeline shaped by TPU HBM costs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicpig_tpu.ops.pallas.block_attend import _NBUF, _NEG, online_update


def _kernel(ids_ref, len_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm,
            o_ref, lse_ref,
            kbuf, ksbuf, vbuf, vsbuf, sbuf, sems, m_ref, l_ref, acc_ref, *,
            fold: int, d: int, g: int, vquant: bool, nbp: int, ch: int,
            pk: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    nchunks = nbp // ch
    krows = kbuf.shape[-2]          # K rows per block (byte-rows if packed)
    cols = krows                    # score columns per block == K rows
    vrows = vbuf.shape[-2]
    ng = pk * fold

    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, ci, j):
        nb = ids_ref[b, h, ci * ch + j]
        ops = [pltpu.make_async_copy(
                   k_hbm.at[b, h, pl.ds(nb * krows, krows)],
                   kbuf.at[slot, j], sems.at[slot, j, 0]),
               pltpu.make_async_copy(
                   ks_hbm.at[b, h, :, pl.ds(nb * cols, cols)],
                   ksbuf.at[slot, j], sems.at[slot, j, 1]),
               pltpu.make_async_copy(v_hbm.at[b, h, nb],
                                     vbuf.at[slot, j], sems.at[slot, j, 2])]
        if vquant:
            ops.append(pltpu.make_async_copy(
                vs_hbm.at[b, h, :, pl.ds(nb * vrows, vrows)],
                vsbuf.at[slot, j], sems.at[slot, j, 3]))
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
    q2 = q_ref[0, 0]                                    # [GF, 128] bf16
    length = len_ref[b]

    def rep_groups(a, lo_g, n):
        return jnp.concatenate(
            [a[f:f + 1] for f in range(lo_g, lo_g + n) for _ in range(g)],
            axis=0)

    def body(ci, _):
        slot = ci % _NBUF

        @pl.when(ci + 1 < nchunks)
        def _():
            issue((ci + 1) % _NBUF, ci + 1)

        wait(slot, ci)
        # Per-block scores staged through VMEM scratch (a ch-leading
        # in-register stack may not lower on Mosaic).
        for j in range(ch):
            nb = ids_ref[b, h, ci * ch + j]
            sc = ksbuf[pl.ds(slot, 1)][0][j]            # [ng, cols] f32
            if pk == 2:
                ki = kbuf[pl.ds(slot, 1)][0][j].astype(jnp.int32)
                lo = ((ki << 28) >> 28).astype(jnp.bfloat16)
                hi = (ki >> 4).astype(jnp.bfloat16)
                raw_lo = jax.lax.dot_general(
                    q2, lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [GF, cols]
                raw_hi = jax.lax.dot_general(
                    q2, hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                raw = jnp.concatenate(
                    [raw_lo * rep_groups(sc, 0, fold),
                     raw_hi * rep_groups(sc, fold, fold)], axis=0)
            else:
                kj = kbuf[pl.ds(slot, 1)][0][j].astype(jnp.bfloat16)
                raw = jax.lax.dot_general(
                    q2, kj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [GF, cols]
                raw = raw * rep_groups(sc, 0, fold)
            # Length mask from the block's token map (pack4 docstring):
            # group i = hlf*fold + f at local col c scores token
            # (nb*vrows + hlf*cols + c)*fold + f.
            col = jax.lax.broadcasted_iota(jnp.int32, (ng * g, cols), 1)
            grp = jax.lax.broadcasted_iota(jnp.int32, (ng * g, cols),
                                           0) // g
            hlf, f = grp // fold, grp % fold
            tok = (nb * vrows + hlf * cols + col) * fold + f
            sbuf[j] = jnp.where(tok < length, raw, -jnp.inf)
        s_all = sbuf[:]                                 # [ch, ng*G, cols]
        vslot = vbuf[pl.ds(slot, 1)][0]
        vsslot = vsbuf[pl.ds(slot, 1)][0] if vquant else None
        online_update(s_all, vslot, vsslot, m_ref, l_ref, acc_ref,
                      fold=fold, g=g, d=d, quant=vquant, pk=pk)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    l = l_ref[:, :1]
    safe = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
    m = m_ref[:, :1]
    lse = jnp.where(l > 0, m + jnp.log(safe), -jnp.inf)
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _io(b, h, ids, lens):
    return (b, h, 0, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "head_dim",
                                             "sm_scale", "interpret",
                                             "packed"))
def rescore_attend(q: jax.Array, blk_ids: jax.Array, k: jax.Array,
                   k_scale: jax.Array, v: jax.Array,
                   v_scale: jax.Array | None, length: jax.Array,
                   block_size: int, head_dim: int,
                   sm_scale: float | None = None,
                   interpret: bool = False, packed: bool = False):
    """Attention over selected blocks, scores recomputed in-kernel.

    q: [B, Hq, d] (raw queries — scaling happens here, matching
    `exact_scores_ranked`); blk_ids: [B, Hkv, NB'] int32;
    k: int8 token-folded [B, Hkv, S/fold, 128] with fold-major k_scale
    [B, Hkv, fold, S/fold] — or, `packed=True`, int4 nibble-packed
    [B, Hkv, S/(2*fold), 128] with 2*fold-GROUP k_scale
    [B, Hkv, 2*fold, S/(2*fold)] (`ops/pack4.py`; block_size == span);
    v: [B, Hkv, S, d] / token-folded (int8 when the fold-major v_scale is
    given); length: [B] valid offload tokens.
    Returns (out [B, Hkv*G, d] f32, lse [B, Hkv*G] f32).
    """
    b, hq, d = q.shape
    hkv = k.shape[1]
    pk = 2 if packed else 1
    fold = max(128 // d, 1)
    g = hq // hkv
    gf = g * fold
    s = k.shape[2] * k.shape[3] * pk // d
    nbp = blk_ids.shape[-1]
    ch = max(c for c in (16, 8, 4, 2, 1) if nbp % c == 0)
    vquant = v_scale is not None
    if packed:
        from magicpig_tpu.ops.pack4 import SPAN_TOKENS

        assert block_size == SPAN_TOKENS, (block_size, SPAN_TOKENS)
    nblk = s // block_size
    krows = block_size // (pk * fold)   # K rows (byte-rows) per block
    vrows = block_size // fold
    assert interpret or krows % 128 == 0, (
        "compiled rescore_attend needs block_size/(pk*fold) % 128 == 0 "
        f"(got block_size={block_size}, fold={fold}, pk={pk})")
    lane = 128 if fold > 1 else d
    assert k.shape[2] == s // (pk * fold) and k.shape[3] == (
        128 if (fold > 1 or packed) else d), (k.shape, s, d)
    assert k_scale.shape == (b, hkv, pk * fold, s // (pk * fold)), \
        k_scale.shape

    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    qh = qh.reshape(b, hkv, g, d)
    q2 = jnp.zeros((b, hkv, gf, lane), jnp.bfloat16)
    for f in range(fold):
        q2 = jax.lax.dynamic_update_slice(q2, qh, (0, 0, f * g, f * d))

    if v.shape[2] == s and fold > 1:
        v = v.reshape(b, hkv, s // fold, fold * d)
    vlane = v.shape[-1]
    v5 = v.reshape(b, hkv, nblk, vrows, vlane)
    if vquant:
        assert v_scale.shape == (b, hkv, fold, s // fold), v_scale.shape
        vs6 = v_scale.astype(jnp.float32)
    else:
        vs6 = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, g=g, vquant=vquant,
                               nbp=nbp, ch=ch, pk=pk)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((1, 1, gf, lane), _io,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _io, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((_NBUF, ch, krows, k.shape[-1]), k.dtype),
                pltpu.VMEM((_NBUF, ch, pk * fold, krows), jnp.float32),
                pltpu.VMEM((_NBUF, ch, vrows, vlane), v.dtype),
                pltpu.VMEM((_NBUF, ch, fold, vrows), jnp.float32),
                pltpu.VMEM((ch, pk * fold * g, krows), jnp.float32),
                pltpu.SemaphoreType.DMA((_NBUF, ch, 4)),
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
    )(blk_ids.astype(jnp.int32), length.astype(jnp.int32), q2, k, k_scale,
      v5, vs6)
    return out.reshape(b, hkv * g, d), lse[..., 0].reshape(b, hkv * g)
