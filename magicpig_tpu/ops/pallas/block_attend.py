"""Pallas attention over top-ranked blocks (the block_topk consumer).

Given fold-major scores (`ops.pallas.score.exact_scores_folded`) and the
per-kv-head list of selected block ids, attends over exactly those blocks:
the block ids ride `PrefetchScalarGridSpec`, so the Pallas pipeline DMAs
only the selected score/V blocks (32 KB granularity) — XLA's gather lowering
moves the same bytes at ~10 GB/s and dominated the whole decode step.

Everything stays in the fold-major layout (token t -> (f = t % fold,
R = t // fold)): a block of `block_size` consecutive tokens is a CONTIGUOUS
row-range in that layout, so no transposes materialize anywhere. V may be
int8 (token-folded storage) with per-token scales, dequantized in-register.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(ids_ref, s_ref, v_ref, vs_ref, o_ref, lse_ref,
            m_ref, l_ref, acc_ref, *, fold: int, d: int, quant: bool):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = v_ref[0, 0, 0]                                  # [bs/fold, lane]
    for f in range(fold):
        s = s_ref[0, 0, 0, :, f, :]                     # [G, bs/fold] f32
        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
        p = jnp.exp(s - m_new[:, :1])                   # -inf scores -> 0
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vs = v[:, f * d:(f + 1) * d]                    # [bs/fold, d]
        if quant:
            # vs_ref is [.., rows, fold] (rows on sublanes): per-row scale
            # as a sublane-major [rows, 1] slice broadcasting over d.
            scale = vs_ref[0, 0, 0][:, f:f + 1]         # [bs/fold, 1] f32
            vs = (vs.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [G, d]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        l = l_ref[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
        m = m_ref[:, :1]
        lse = jnp.where(l > 0, m + jnp.log(safe), -jnp.inf)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _is(b, h, j, ids):
    return (b, h, ids[b, h, j], 0, 0, 0)


def _iv(b, h, j, ids):
    return (b, h, ids[b, h, j], 0, 0)


def _ivs(b, h, j, ids):
    return (b, h, ids[b, h, j], 0, 0)


def _io(b, h, j, ids):
    return (b, h, 0, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def block_attend(scores_blocks: jax.Array, blk_ids: jax.Array, v: jax.Array,
                 v_scale: jax.Array | None, block_size: int,
                 interpret: bool = False):
    """Attention over selected blocks.

    scores_blocks: [B, Hkv, NB, G, fold, block_size/fold] f32 (already
    scaled and length-masked with -inf; see exact_scores_blocks);
    blk_ids: [B, Hkv, NB'] int32 selected block indices;
    v: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128] (int8 when
    v_scale [B, Hkv, S] f32 is given).
    Returns (out [B, Hkv*G, d] f32, lse [B, Hkv*G] f32).
    """
    b, hkv, nblk, g, fold, rows = scores_blocks.shape
    s = nblk * block_size
    assert rows == block_size // fold
    nbp = blk_ids.shape[-1]
    quant = v_scale is not None
    d = v.shape[-1] if v.shape[2] == s else v.shape[-1] * v.shape[2] // s
    assert fold == max(128 // d, 1), (fold, d)
    if v.shape[2] == s and fold > 1:   # fold V too (free, row-major view)
        v = v.reshape(b, hkv, s // fold, fold * d)
    lane = v.shape[-1]

    s6 = scores_blocks
    v5 = v.reshape(b, hkv, nblk, rows, lane)
    if quant:
        # vs5[nb, r, f] = scale of token nb*bs + r*fold + f (pure reshape).
        vs5 = v_scale.astype(jnp.float32).reshape(b, hkv, nblk, rows, fold)
    else:
        vs5 = jnp.zeros((b, hkv, nblk, rows, fold), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, quant=quant)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv, nbp),
            in_specs=[
                pl.BlockSpec((1, 1, 1, g, fold, rows), _is,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, rows, lane), _iv,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, rows, fold), _ivs,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _io, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, g, 128), jnp.float32),
        ),
        interpret=interpret,
    )(blk_ids.astype(jnp.int32), s6, v5, vs5)
    return out.reshape(b, hkv * g, d), lse[..., 0].reshape(b, hkv * g)
