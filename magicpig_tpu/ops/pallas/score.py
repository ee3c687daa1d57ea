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

`exact_scores_ranked` additionally fuses (a) the length mask — streamed as
a tiny additive [B, 1, fold, S/fold] f32 input with the same block
addressing as the dequant scales, NOT scalar-prefetch (a
PrefetchScalarGridSpec grid measured 5% slower end-to-end in round 1) —
and (b) the block-topk ranking reduce: per-ranking-block max over the GQA
group emitted as a second tiny output. This removes the separate XLA
mask-where pass and the block-max reduce, each of which re-reads the full
[B, Hq, S] f32 score array per layer per step.

Downstream `block_attend` DMAs one [G*fold, block/fold] lane slice per
selected block — no transposed score copies ever materialize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, scale_ref, mask_ref, *outs, fold: int,
            g: int, quant: bool, masked: bool, bs_cols: int,
            packed: bool = False, rank_only: bool = False):
    if rank_only:          # block-max output only (rescore pipeline)
        o_ref, bm_ref = None, outs[0]
    elif len(outs) == 2:
        o_ref, bm_ref = outs
    else:
        o_ref, bm_ref = outs[0], None

    def rep_groups(a, lo_g, n):
        # [groups, rows] -> [n*G, rows]: group rows repeated per query head.
        return jnp.concatenate(
            [a[f:f + 1] for f in range(lo_g, lo_g + n) for _ in range(g)],
            axis=0)

    q2 = q_ref[0, 0]                                    # [GF, 128] bf16
    k = k_ref[0, 0]                                     # [rows(_p), lane]
    if packed:
        # int4-packed K (ops/pack4.py): low/high nibbles hold the span's
        # first/second half of folded rows; the two dots' outputs stack on
        # the ROW axis into the 2*fold-group score layout — one contiguous
        # store, no lane interleave. Shifts in int32 (sign-extending).
        ki = k.astype(jnp.int32)
        lo = ((ki << 28) >> 28).astype(jnp.bfloat16)
        hi = (ki >> 4).astype(jnp.bfloat16)
        raw_lo = jax.lax.dot_general(
            q2, lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [GF, rows_p]
        raw_hi = jax.lax.dot_general(
            q2, hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = scale_ref[0, 0]                            # [2*fold, rows_p]
        raw = jnp.concatenate(
            [raw_lo * rep_groups(sc, 0, fold),
             raw_hi * rep_groups(sc, fold, fold)], axis=0)  # [2GF, rows_p]
        if masked:
            raw = raw + rep_groups(mask_ref[0, 0], 0, 2 * fold)
        if o_ref is not None:
            o_ref[0, 0] = raw
        if bm_ref is not None:
            nbs = raw.shape[1] // bs_cols
            bm = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.max(raw[:, j * bs_cols:(j + 1) * bs_cols],
                            axis=(0, 1), keepdims=True), (1, 128))
                 for j in range(nbs)], axis=0)
            bm_ref[0, 0] = bm
        return
    raw = jax.lax.dot_general(
        q2, k.astype(jnp.bfloat16) if quant else k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [GF, rows]
    if quant:
        sc = scale_ref[0, 0]                            # [fold, rows]
        raw = raw * rep_groups(sc, 0, fold)
    if masked:
        raw = raw + rep_groups(mask_ref[0, 0], 0, fold)
    if o_ref is not None:
        o_ref[0, 0] = raw
    if bm_ref is not None:
        # Fused block ranking: max over the GQA group and each ranking
        # block's columns (static slices — a lane-splitting reshape would
        # not lower). Each block's max is broadcast over the 128-lane minor
        # dim: a (nbs, 128) store tiles legally where a (1, nbs) one does
        # not (Mosaic requires the last two block dims % (8, 128) or equal
        # to the array dims).
        nbs = raw.shape[1] // bs_cols
        bm = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(raw[:, j * bs_cols:(j + 1) * bs_cols], axis=(0, 1),
                        keepdims=True), (1, 128)) for j in range(nbs)],
            axis=0)                                     # [nbs, 128]
        bm_ref[0, 0] = bm


def _iq(b, h, c):
    return (b, h, 0, 0)


def _ikv(b, h, c):
    return (b, h, c, 0)


def _isc(b, h, c):
    return (b, h, 0, c)


def _imask(b, h, c):
    return (b, 0, 0, c)


def _ibm(b, h, c):
    return (b, h, c, 0)


def _scores_call(q, k, k_scale, mask, sm_scale, block_tokens, rank_block,
                 interpret, packed=False, rank_only=False):
    b, hq, d = q.shape
    hkv = k.shape[1]
    pk = 2 if packed else 1   # tokens per stored byte-row, relative to fold
    s = k.shape[2] * k.shape[3] * pk // d
    g = hq // hkv
    fold = max(128 // d, 1)
    gf = g * fold
    lane = 128 if fold > 1 else d
    if packed:
        assert lane == 128 or fold == 1, (d, lane)
        lane = 128
    blk = min(block_tokens, s)
    # Cap the double-buffered K block at ~4 MB of VMEM (bf16 K at d=128
    # would otherwise blow the ~16 MB budget at the 64K-token default).
    while (blk > pk * fold * 32
           and (blk // (pk * fold)) * lane * k.dtype.itemsize > 4 << 20):
        blk //= 2
    while s % blk:
        blk //= 2
    assert s % blk == 0 and blk % (pk * fold * 32) == 0
    if rank_block is not None:
        assert blk % rank_block == 0 and rank_block % (pk * fold) == 0, (
            blk, rank_block, fold)
    if packed:
        # Each grid block must cover whole pack spans (ops/pack4.py).
        from magicpig_tpu.ops.pack4 import SPAN_TOKENS

        assert blk % SPAN_TOKENS == 0, (blk, SPAN_TOKENS)
        assert rank_block is None or rank_block == SPAN_TOKENS, rank_block
    rows = blk // (pk * fold)   # byte-rows per grid step
    grp = pk * fold             # score/scale/mask row groups
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None
    assert quant or not packed
    masked = mask is not None

    qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    qh = qh.reshape(b, hkv, g, d)
    q2 = jnp.zeros((b, hkv, gf, lane), jnp.bfloat16)
    for f in range(fold):
        q2 = jax.lax.dynamic_update_slice(q2, qh, (0, 0, f * g, f * d))
    k2 = k if packed else k.reshape(b, hkv, s // fold, lane)
    cols = s // (fold * pk)     # scale/mask/score columns
    if quant:
        assert k_scale.shape == (b, hkv, grp, cols), (k_scale.shape, grp)
        scale_f = k_scale.astype(jnp.float32)
    else:
        scale_f = jnp.zeros((b, hkv, grp, cols), jnp.float32)
    if masked:
        assert mask.shape == (b, grp, cols), (mask.shape, grp)
        mask4 = mask.astype(jnp.float32)[:, None]       # [B,1,grp,cols]
    else:
        mask4 = jnp.zeros((b, 1, grp, cols), jnp.float32)

    bs_cols = (rank_block // (pk * fold)) if rank_block is not None else 0
    kernel = functools.partial(_kernel, fold=fold, g=g, quant=quant,
                               masked=masked, bs_cols=bs_cols,
                               packed=packed, rank_only=rank_only)
    assert not rank_only or rank_block is not None
    if rank_only:
        # Block-max only: the [B,Hq,S] f32 score array never touches HBM
        # (the rescore-attend pipeline recomputes selected blocks' scores).
        out_specs, out_shape = [], []
    else:
        out_specs = [pl.BlockSpec((1, 1, pk * gf, rows), _isc,
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((b, hkv, pk * gf, cols),
                                          jnp.float32)]
    if rank_block is not None:
        nb = s // rank_block
        nbs = blk // rank_block
        assert nbs == nb or nbs % 8 == 0, (
            f"block-max store needs blk/rank_block % 8 == 0 or one grid "
            f"step covering the whole sequence (blk={blk}, "
            f"rank_block={rank_block}, S={s})")
        out_specs.append(pl.BlockSpec((1, 1, nbs, 128), _ibm,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, hkv, nb, 128),
                                              jnp.float32))
    else:
        kernel = functools.partial(_nobm_kernel, inner=kernel)

    multi = len(out_specs) > 1
    res = pl.pallas_call(
        kernel,
        grid=(b, hkv, s // blk),
        in_specs=[
            pl.BlockSpec((1, 1, gf, lane), _iq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, lane), _ikv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, grp, rows), _isc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, grp, rows), _imask, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if multi else out_specs[0],
        out_shape=tuple(out_shape) if multi else out_shape[0],
        interpret=interpret,
    )(q2, k2, scale_f, mask4)
    if rank_only:
        return None, res[..., 0]                        # [B,Hkv,nb]
    if rank_block is not None:
        return res[0], res[1][..., 0]                   # scores, [B,Hkv,nb]
    return res


def _nobm_kernel(q_ref, k_ref, scale_ref, mask_ref, o_ref, *, inner):
    inner(q_ref, k_ref, scale_ref, mask_ref, o_ref, None)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_tokens",
                                             "interpret"))
def exact_scores_folded(q: jax.Array, k: jax.Array,
                        k_scale: jax.Array | None,
                        sm_scale: float | None = None,
                        block_tokens: int = 65536,
                        interpret: bool = False) -> jax.Array:
    """Scaled attention scores in fold-major layout (module docstring).

    q: [B, Hq, d]; k: [B, Hkv, S, d] or token-folded [B, Hkv, S/fold, 128]
    (bf16, or int8 with per-row f32 k_scale in the FOLD-MAJOR layout
    [B, Hkv, fold, S/fold] — the layout `runtime/state.py` stores, streamed
    here with no transpose; [.., f, c] scales token c*fold + f).
    Returns [B, Hkv, G*fold, S/fold] f32 (un-masked; [.., f*G + g, c]
    scores token c*fold + f for query head g of the kv head).
    """
    return _scores_call(q, k, k_scale, None, sm_scale, block_tokens, None,
                        interpret)


@functools.partial(jax.jit, static_argnames=("rank_block", "sm_scale",
                                             "block_tokens", "interpret",
                                             "packed"))
def exact_scores_ranked(q: jax.Array, k: jax.Array,
                        k_scale: jax.Array | None, mask: jax.Array,
                        rank_block: int, sm_scale: float | None = None,
                        block_tokens: int = 65536,
                        interpret: bool = False, packed: bool = False):
    """Masked scores + fused per-block ranking max (module docstring).

    mask: [B, fold, S/fold] f32 additive length mask (0 valid / -inf
    invalid; [.., f, c] masks token c*fold + f — build with `length_mask`).
    rank_block: ranking block size in tokens (static).
    Returns (scores [B, Hkv, G*fold, S/fold] f32 — already masked,
    block_max [B, Hkv, S/rank_block] f32 — max over the GQA group and the
    block's tokens, -inf for fully-invalid blocks).

    `packed=True`: K is int4-packed [B, Hkv, S/(2*fold), 128]
    (`ops/pack4.py`); k_scale and mask arrive in the 2*fold-GROUP layout
    ([B, Hkv, 2*fold, S/(2*fold)] / [B, 2*fold, S/(2*fold)], see
    `pack4.group_scales` / `pack4.group_length_mask`), and the returned
    scores are [B, Hkv, 2*G*fold, S/(2*fold)] in that group layout
    (token map `pack4.group_token_index`). rank_block must equal the
    pack span; the block-max output is unchanged.
    """
    return _scores_call(q, k, k_scale, mask, sm_scale, block_tokens,
                        rank_block, interpret, packed=packed)


@functools.partial(jax.jit, static_argnames=("rank_block", "sm_scale",
                                             "block_tokens", "interpret",
                                             "packed"))
def block_rank(q: jax.Array, k: jax.Array, k_scale: jax.Array | None,
               mask: jax.Array, rank_block: int,
               sm_scale: float | None = None, block_tokens: int = 65536,
               interpret: bool = False, packed: bool = False) -> jax.Array:
    """Per-block ranking max ONLY — same math as `exact_scores_ranked` but
    the [B, Hq, S] f32 score array never leaves the kernel (no HBM store):
    the rescore-attend pipeline (`ops/pallas/rescore_attend.py`) recomputes
    the selected blocks' scores from the same K stream, bit-identically.
    Returns block_max [B, Hkv, S/rank_block] f32."""
    _, bm = _scores_call(q, k, k_scale, mask, sm_scale, block_tokens,
                         rank_block, interpret, packed=packed,
                         rank_only=True)
    return bm


def length_mask(length: jax.Array, s: int, fold: int) -> jax.Array:
    """Additive fold-major length mask [B, fold, S/fold] f32: 0 where token
    c*fold + f < length, -inf beyond. Depends only on off_len, so one array
    serves every layer of a decode step."""
    cols = s // fold
    tok = (jnp.arange(cols)[None, :] * fold
           + jnp.arange(fold)[:, None])                 # [fold, S/fold]
    return jnp.where(tok[None] < length[:, None, None], 0.0, -jnp.inf)


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
