"""Streaming exact-score kernel for block_topk over (optionally int8) K.

Scores every cached key against the decode queries in one pass:
raw = q @ K_blk^T on the MXU, dequantized in-register from int8 (the whole
point: XLA's einsum over an int8 cache hoists a lane-padded bf16 copy of the
entire cache inside the decode scan — 4x the int8 bytes resident and a 2x
read; this kernel reads the raw int8 layout once).

Output layout is BLOCK-MAJOR: [B, Hkv, NB, G, block_size] with
NB = S/block_size; lane l of block nb holds token nb*block_size +
(l %% rows)*fold + l//rows  (rows = block_size/fold) — i.e. fold-major
within the block, merged into one 128-lane dim so gathered DMAs stay
tile-aligned. Downstream `block_attend` indexes the NB dim with
scalar-prefetched block ids, and the block ranking is a plain reduce — no
transposed copies of the [B,Hkv,G,S] scores ever materialize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, scale_ref, o_ref, *, fold: int, d: int,
            sm_scale: float, quant: bool, nbb: int, rows_b: int):
    q = q_ref[0, 0]                                     # [G, d]
    k = k_ref[0, 0]                                     # [rows, lane]
    for f in range(fold):
        ks = k[:, f * d:(f + 1) * d]                    # [rows, d]
        raw = jax.lax.dot_general(
            q, ks.astype(jnp.bfloat16) if quant else ks,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [G, rows]
        s = raw * sm_scale
        if quant:
            s = s * scale_ref[0, 0, f:f + 1, :]         # [1, rows] bcast
        for sb in range(nbb):                           # per 128-token block
            o_ref[0, 0, sb, :, f * rows_b:(f + 1) * rows_b] = (
                s[:, sb * rows_b:(sb + 1) * rows_b])


def _iq(b, h, c):
    return (b, h, 0, 0)


def _ikv(b, h, c):
    return (b, h, c, 0)


def _isc(b, h, c):
    return (b, h, 0, c)


def _io(b, h, c):
    return (b, h, c, 0, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "sm_scale",
                                             "block_tokens", "interpret"))
def exact_scores_blocks(q: jax.Array, k: jax.Array,
                        k_scale: jax.Array | None, block_size: int = 128,
                        sm_scale: float | None = None,
                        block_tokens: int = 16384,
                        interpret: bool = False) -> jax.Array:
    """Scaled attention scores in block-major layout (module docstring).

    q: [B, Hq, d]; k: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128]
    (bf16, or int8 with per-row f32 k_scale [B, Hkv, S]).
    Returns [B, Hkv, S/block_size, G, block_size] f32 (un-masked;
    lane order: see module docstring).
    """
    b, hq, d = q.shape
    hkv = k.shape[1]
    s = k.shape[2] * k.shape[3] // d
    g = hq // hkv
    fold = max(128 // d, 1)
    blk = min(block_tokens, s)
    assert s % blk == 0 and blk % (fold * 32) == 0 and blk % block_size == 0
    rows = blk // fold
    rows_b = block_size // fold
    nbb = blk // block_size
    nblk = s // block_size
    lane = 128 if fold > 1 else d
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None

    qh = q.astype(jnp.bfloat16).reshape(b, hkv, g, d)
    k2 = k.reshape(b, hkv, s // fold, lane)
    if quant:
        scale_f = k_scale.astype(jnp.float32).reshape(
            b, hkv, s // fold, fold).transpose(0, 1, 3, 2)  # [B,Hkv,fold,S/f]
    else:
        scale_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, sm_scale=scale,
                               quant=quant, nbb=nbb, rows_b=rows_b)
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, s // blk),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), _iq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, lane), _ikv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fold, rows), _isc, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nbb, g, block_size), _io,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, nblk, g, block_size),
                                       jnp.float32),
        interpret=interpret,
    )(qh, k2, scale_f)
    return out


def exact_scores(q: jax.Array, k: jax.Array, k_scale: jax.Array | None,
                 sm_scale: float | None = None, block_tokens: int = 16384,
                 interpret: bool = False) -> jax.Array:
    """Token-order scores [B, Hkv, G, S] f32 (reorders the block-major
    output — prefer `exact_scores_blocks` in jitted hot paths)."""
    b, hq, d = q.shape
    hkv = k.shape[1]
    s = k.shape[2] * k.shape[3] // d
    g = hq // hkv
    out = exact_scores_blocks(q, k, k_scale, block_size=128,
                              sm_scale=sm_scale, block_tokens=block_tokens,
                              interpret=interpret)
    # [B,Hkv,NB,G,128] (lane = f*rows + r) -> token order t = r*fold + f
    fold = max(128 // d, 1)
    rows_b = 128 // fold
    out = out.reshape(b, hkv, -1, g, fold, rows_b)
    out = out.transpose(0, 1, 3, 2, 5, 4)           # [B,Hkv,G,NB,rows_b,fold]
    return out.reshape(b, hkv, g, s)
