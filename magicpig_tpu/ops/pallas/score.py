"""Streaming exact-score kernel for block_topk over (optionally int8) K.

Scores every cached key against the decode queries in one pass:
raw = q2 @ K_blk^T on the MXU, dequantized by a fused per-row scale
multiply (the whole point: XLA's einsum over an int8 cache hoists a
lane-padded bf16 copy of the entire cache inside the decode scan — 4x the
int8 bytes resident and a 2x read; this kernel reads the raw int8 layout
once).

The queries are packed fold-major into q2 [G*fold, 128] with
q2[f*G + g, f*d:(f+1)*d] = q[g] (fold = 128/d), so ONE dot per grid step
scores all folds against the token-folded K rows, and the output layout is
[B, Hkv, G*fold, S/fold]: row f*G + g, column c holds head g's score of
token c*fold + f — exactly the token-folded cache order
(`runtime/state.py`), emitted in ONE contiguous store per grid step.
(Earlier iterations measured: a block-major layout needed fold * S/block
sub-block stores — ~0.6 ms/layer of store issue at 96K; per-fold [G, d]
dots with d=64 left the MXU row-starved; and every score-layout transpose
in XLA costs a full copy of the [B,Hq,S] f32 array.)

Downstream `block_attend` DMAs one [G*fold, block/fold] lane slice per
selected block, and the block ranking is a plain reduce — no transposed
score copies ever materialize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, scale_ref, o_ref, *, fold: int, g: int,
            quant: bool):
    q2 = q_ref[0, 0]                                    # [GF, 128] bf16
    k = k_ref[0, 0]                                     # [rows, lane]
    raw = jax.lax.dot_general(
        q2, k.astype(jnp.bfloat16) if quant else k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [GF, rows]
    if quant:
        sc = scale_ref[0, 0]                            # [fold, rows]
        s8 = jnp.concatenate(
            [sc[f:f + 1] for f in range(fold) for _ in range(g)], axis=0)
        raw = raw * s8
    o_ref[0, 0] = raw


def _iq(b, h, c):
    return (b, h, 0, 0)


def _ikv(b, h, c):
    return (b, h, c, 0)


def _isc(b, h, c):
    return (b, h, 0, c)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_tokens",
                                             "interpret"))
def exact_scores_folded(q: jax.Array, k: jax.Array,
                        k_scale: jax.Array | None,
                        sm_scale: float | None = None,
                        block_tokens: int = 32768,
                        interpret: bool = False) -> jax.Array:
    """Scaled attention scores in fold-major layout (module docstring).

    q: [B, Hq, d]; k: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128]
    (bf16, or int8 with per-row f32 k_scale in the FOLD-MAJOR layout
    [B, Hkv, fold, S/fold] — the layout `runtime/state.py` stores, streamed
    here with no transpose; [.., f, c] scales token c*fold + f).
    Returns [B, Hkv, G*fold, S/fold] f32 (un-masked; [.., f*G + g, c]
    scores token c*fold + f for query head g of the kv head).
    """
    b, hq, d = q.shape
    hkv = k.shape[1]
    s = k.shape[2] * k.shape[3] // d
    g = hq // hkv
    fold = max(128 // d, 1)
    gf = g * fold
    lane = 128 if fold > 1 else d
    blk = min(block_tokens, s)
    # Cap the double-buffered K block at ~4 MB of VMEM (bf16 K at d=128
    # would otherwise blow the ~16 MB budget at the 32K-token default).
    while blk > fold * 32 and (blk // fold) * lane * k.dtype.itemsize > 4 << 20:
        blk //= 2
    while s % blk:
        blk //= 2
    assert s % blk == 0 and blk % (fold * 32) == 0
    rows = blk // fold
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None

    qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    qh = qh.reshape(b, hkv, g, d)
    q2 = jnp.zeros((b, hkv, gf, lane), jnp.bfloat16)
    for f in range(fold):
        q2 = jax.lax.dynamic_update_slice(q2, qh, (0, 0, f * g, f * d))
    k2 = k.reshape(b, hkv, s // fold, lane)
    if quant:
        assert k_scale.shape == (b, hkv, fold, s // fold), k_scale.shape
        scale_f = k_scale.astype(jnp.float32)
    else:
        scale_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, g=g, quant=quant)
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, s // blk),
        in_specs=[
            pl.BlockSpec((1, 1, gf, lane), _iq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, lane), _ikv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fold, rows), _isc, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, gf, rows), _isc,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, gf, s // fold),
                                       jnp.float32),
        interpret=interpret,
    )(q2, k2, scale_f)
    return out


def exact_scores(q: jax.Array, k: jax.Array, k_scale: jax.Array | None,
                 sm_scale: float | None = None, block_tokens: int = 32768,
                 interpret: bool = False) -> jax.Array:
    """Token-order scores [B, Hkv, G, S] f32 (reorders the fold-major
    output — prefer `exact_scores_folded` in jitted hot paths)."""
    b, hq, d = q.shape
    hkv = k.shape[1]
    s = k.shape[2] * k.shape[3] // d
    g = hq // hkv
    fold = max(128 // d, 1)
    out = exact_scores_folded(q, k, k_scale, sm_scale=sm_scale,
                              block_tokens=block_tokens, interpret=interpret)
    # [B,Hkv,G*fold,S/fold]: row f*G+g, col c = (head g, token c*fold + f)
    out = out.reshape(b, hkv, fold, g, s // fold)
    return out.transpose(0, 1, 3, 4, 2).reshape(b, hkv, g, s)
