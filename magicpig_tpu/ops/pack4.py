"""Packed-int4 layout for the block_topk offload K cache.

K is only ever read by the block_topk scorer (`ops/pallas/score.py`) —
`block_attend` consumes scores + V — so K can drop to 4-bit storage
without touching the attend path's V math. Packing halves the scorer's
dominant per-step HBM stream AND the off_k state (755 MB/request at 96K,
BENCHMARKS.md), which raises max batch.

Layout. The token-folded int8 cache stores fold = 128/d tokens per
128-byte row (`runtime/state.py`). Packed-int4 pairs rows within each
`span` of rows (span = ranking block, 512 tokens): packed row
p = (s, r) holds folded row s*span_rows + r in its LOW nibbles and row
s*span_rows + span_rows/2 + r in its HIGH nibbles. The scorer unpacks a
block with two arithmetic shifts and emits the low-row and high-row
score matrices stacked on the ROW axis — one contiguous store, no lane
interleave. Scores (and the fold-major scales/length masks that ride
them) therefore use a 2*fold-GROUP layout: group g2 = h*fold + f
(h = nibble half, f = fold slot) at column c scores token

    token(g2, c) = ((c//half)*span_rows + h*half + c%half) * fold + f

with half = span_rows/2. Within every 512-token ranking block the
mapping is a bijection, so per-block ranking maxes and whole-block
attends are unchanged semantically; `group_token_index` materializes the
map for mask building and oracles.

Why pair across span halves instead of adjacent rows: the unpacked low
(high) nibbles of a span then cover its first (second) half of rows
contiguously and in order, so the stacked score store and the attend's
per-block DMA slices stay contiguous with no in-kernel shuffles.
"""

from __future__ import annotations

import jax.numpy as jnp

from magicpig_tpu.ops.quant import pack_nibbles, unpack_nibbles

SPAN_TOKENS = 512   # must equal the block_topk ranking block size


def pack_rows(k2: jnp.ndarray, fold: int,
              span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """[..., R, 128] int8 (4-bit grid) -> [..., R/2, 128] packed bytes."""
    span_rows = span_tokens // fold
    half = span_rows // 2
    r = k2.shape[-2]
    assert r % span_rows == 0, (r, span_rows)
    k4 = k2.reshape(*k2.shape[:-2], r // span_rows, 2, half, k2.shape[-1])
    return pack_nibbles(k4[..., 0, :, :], k4[..., 1, :, :]).reshape(
        *k2.shape[:-2], r // 2, k2.shape[-1])


def unpack_rows(packed: jnp.ndarray, fold: int,
                span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """Inverse of `pack_rows`: [..., R/2, 128] -> [..., R, 128] int8."""
    span_rows = span_tokens // fold
    half = span_rows // 2
    rp = packed.shape[-2]
    assert rp % half == 0, (rp, half)
    p4 = packed.reshape(*packed.shape[:-2], rp // half, half,
                        packed.shape[-1])
    lo, hi = unpack_nibbles(p4)
    k4 = jnp.stack([lo, hi], axis=-3)   # [..., nspan, 2, half, 128]
    return k4.reshape(*packed.shape[:-2], rp * 2, packed.shape[-1])


def group_token_index(s: int, fold: int,
                      span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """[2*fold, s/(2*fold)] int32: token index scored at (group, column)
    in the packed score layout (module docstring)."""
    span_rows = span_tokens // fold
    half = span_rows // 2
    cols = s // (2 * fold)
    c = jnp.arange(cols)[None, :]
    g2 = jnp.arange(2 * fold)[:, None]
    h, f = g2 // fold, g2 % fold
    return (((c // half) * span_rows + h * half + c % half) * fold
            + f).astype(jnp.int32)


def group_scales(scale_tokens: jnp.ndarray, fold: int,
                 span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """Token-order scales [..., S] -> packed-group layout
    [..., 2*fold, S/(2*fold)] (the layout the packed scorer and attend
    stream next to the scores)."""
    s = scale_tokens.shape[-1]
    idx = group_token_index(s, fold, span_tokens)        # [2f, cols]
    return jnp.take(scale_tokens, idx.reshape(-1), axis=-1).reshape(
        *scale_tokens.shape[:-1], idx.shape[0], idx.shape[1])


def ungroup_scales(grp: jnp.ndarray, fold: int,
                   span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """Inverse of `group_scales`: [..., 2*fold, S/(2*fold)] -> token-order
    [..., S] (the XLA-fallback decode path's layout)."""
    s = grp.shape[-1] * grp.shape[-2]
    idx = group_token_index(s, fold, span_tokens).reshape(-1)
    inv = jnp.zeros((s,), jnp.int32).at[idx].set(
        jnp.arange(s, dtype=jnp.int32))
    return jnp.take(grp.reshape(*grp.shape[:-2], s), inv, axis=-1)


def group_length_mask(length: jnp.ndarray, s: int, fold: int,
                      span_tokens: int = SPAN_TOKENS) -> jnp.ndarray:
    """Additive length mask in the packed-group layout
    [B, 2*fold, S/(2*fold)] f32 (cf. `score.length_mask`)."""
    idx = group_token_index(s, fold, span_tokens)        # [2f, cols]
    return jnp.where(idx[None] < length[:, None, None], 0.0, -jnp.inf)
