"""Attention primitives (pure XLA; Pallas fast paths live in ops/pallas/).

Three compute paths, mirroring the reference's decomposition:
  * `flash_prefill` — causal chunked prefill attention (the reference uses
    FlashInfer's single_prefill kernel per 8192-token chunk,
    `models/llama.py:233-257`). Implemented as a lax.scan over KV blocks with
    running (max, sum) so scores never materialize at [Sq, Skv].
  * `full_decode` — one-query dense attention over a cached region with an
    explicit length, returning (out, lse) for LSE-merging (the reference's
    FlashInfer decode `run_return_lse`, `models/attnserver.py:292-296`).
  * `lsh_masked_decode` — the LSH-sampled estimator in its dense masked
    formulation: collision mask (>=2 of L tables) + debias + masked softmax.
    Mathematically identical to the reference's hash-table retrieval path
    (`evaluations/RULER/pred/attnserver_dist.py:813-851` proves the
    equivalence in the reference itself); serves as accuracy oracle for the
    budgeted/gathered fast paths.
  * `lsh_sampled_decode` — budgeted gather formulation: top-`budget` sampled
    token ids per head, gather K/V rows, attend over the compacted set. Same
    math as the mask when budget >= nnz; this is the layout the Pallas
    kernel accelerates.

All decode paths take GQA-shaped inputs: q [B, Hq, d] over kv caches
[B, Hkv, S, d] with Hq = G * Hkv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magicpig_tpu.ops.debias import debias_scores

_NEG_INF = jnp.float32(-jnp.inf)


def _safe_denom(l: jnp.ndarray) -> jnp.ndarray:
    """Guard a softmax denominator: l == 0 only when every score is -inf
    (the numerator is then 0 too). A 1e-38 floor is subnormal in f32 and can
    flush to zero (0/0 = NaN), so substitute 1 exactly."""
    return jnp.where(l > 0, l, 1.0)


def _gqa_reshape(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[B, Hq, d] -> [B, Hkv, G, d]."""
    b, hq, d = q.shape
    return q.reshape(b, num_kv_heads, hq // num_kv_heads, d)


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_k", "sm_scale", "window",
                                             "differentiable",
                                             "return_lse"))
def flash_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  q_offset: jnp.ndarray, kv_len: jnp.ndarray,
                  block_k: int = 1024, sm_scale: float | None = None,
                  window: int | None = None, differentiable: bool = False,
                  return_lse: bool = False):
    """Causal attention for a prefill chunk against the filled KV prefix.

    q: [B, Sq, Hq, d] — chunk queries at absolute positions q_offset..+Sq.
    k, v: [B, Skv_max, Hkv, d] — cache buffers; only [:kv_len] is valid.
    window: sliding-window size (query t sees keys in (t-window, t]), or
    None for full causal (`mistral_ref.py:305`).
    differentiable: use a static-bound lax.scan over ALL KV blocks instead
    of the dynamic-bound fori_loop (reverse-mode AD cannot differentiate a
    dynamic-bound loop) — training callers set this; inference keeps the
    causal-triangle skip.
    return_lse: also return the per-query log-sum-exp [B, Sq, Hq] f32
    (-inf for fully-masked queries) for cross-shard LSE merging — the
    ring sequence-parallel prefill (`parallel/ring.py`) merges per-shard
    partials with it.
    Returns [B, Sq, Hq, d] in q.dtype (plus lse when return_lse).
    """
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    hkv = k.shape[2]
    g = hq // hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)

    if differentiable and not return_lse:
        # Training path: custom-VJP flash backward. The plain lax.scan
        # autodiff saves every per-block score tensor across the scan —
        # [nblk, B, Hkv, G, Sq, Bk] f32, 68.7 GB at B=8/S=16K — and OOMs
        # (results/accuracy_r4/train_16k.log). The custom backward
        # recomputes scores per block from (q, k, lse) instead, the
        # standard FlashAttention-2 recipe.
        return _flash_prefill_train(block_k, scale, window, q, k, v,
                                    jnp.asarray(q_offset, jnp.int32),
                                    jnp.asarray(kv_len, jnp.int32))

    # [B, Hkv, G, Sq, d]
    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d)
    q_pos = q_offset + jnp.arange(sq)  # [Sq]

    num_blocks = (skv + block_k - 1) // block_k
    # Only blocks that intersect [lo, kv_len) contribute: kv_len bounds the
    # filled prefix (causal triangle — without this every query chunk would
    # pay the full S scan, doubling prefill FLOPs at long context) and with
    # a sliding window blocks entirely behind every query are dead too.
    nblk_dyn = jnp.minimum((kv_len + block_k - 1) // block_k, num_blocks)
    if window is not None:
        blk_lo = jnp.maximum(q_offset - (window - 1), 0) // block_k
    else:
        blk_lo = jnp.int32(0)

    def body(carry, blk):
        m, l, acc = carry
        start = blk * block_k
        kb = jax.lax.dynamic_slice_in_dim(k, start, block_k, axis=1)  # [B,Bk,Hkv,d]
        vb = jax.lax.dynamic_slice_in_dim(v, start, block_k, axis=1)
        kb = kb.transpose(0, 2, 1, 3)  # [B,Hkv,Bk,d]
        vb = vb.transpose(0, 2, 1, 3)
        k_pos = start + jnp.arange(block_k)  # [Bk]
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qh, kb,
                       preferred_element_type=jnp.float32) * scale
        mask = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < kv_len)
        if window is not None:
            mask = mask & (q_pos[:, None] - k_pos[None, :] < window)
        s = jnp.where(mask[None, None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # All-masked rows keep m == -inf; shift by 0 there to avoid NaNs.
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        p = jnp.exp(s - m_safe[..., None])
        # When m == -inf (no contributions yet) alpha only scales the zero
        # l/acc, so any finite value works — but it must not be computed as
        # m_new * 0, which is NaN when the whole block is masked out (e.g.
        # entirely outside the sliding window) and m_new is still -inf.
        alpha = jnp.exp(jnp.where(jnp.isneginf(m), 0.0, m - m_safe))
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, hkv, g, sq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, sq), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, sq, d), jnp.float32)
    if differentiable:
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0),
                                      jnp.arange(num_blocks))
    else:
        m, l, acc = jax.lax.fori_loop(
            blk_lo, nblk_dyn,
            lambda blk, carry: body(carry, blk)[0], (m0, l0, acc0))
    out = acc / _safe_denom(l)[..., None]
    out = out.reshape(b, hq, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)
    if return_lse:
        lse = jnp.where(l > 0, m + jnp.log(_safe_denom(l)), -jnp.inf)
        return out, lse.reshape(b, hq, sq).transpose(0, 2, 1)
    return out


# ---------------------------------------------------------------------------
# Training flash attention (custom VJP)
# ---------------------------------------------------------------------------


def _fp_mask(q_pos, k_pos, kv_len, window):
    mask = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < kv_len)
    if window is not None:
        mask = mask & (q_pos[:, None] - k_pos[None, :] < window)
    return mask  # [Sq, Bk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_prefill_train(block_k, scale, window, q, k, v, q_offset, kv_len):
    out, _ = _fp_train_fwd(block_k, scale, window, q, k, v, q_offset, kv_len)
    return out


def _fp_train_fwd(block_k, scale, window, q, k, v, q_offset, kv_len):
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d)
    q_pos = q_offset + jnp.arange(sq)
    num_blocks = (skv + block_k - 1) // block_k

    def body(carry, blk):
        m, l, acc = carry
        start = blk * block_k
        kb = jax.lax.dynamic_slice_in_dim(k, start, block_k, 1).transpose(0, 2, 1, 3)
        vb = jax.lax.dynamic_slice_in_dim(v, start, block_k, 1).transpose(0, 2, 1, 3)
        k_pos = start + jnp.arange(block_k)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qh, kb,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(_fp_mask(q_pos, k_pos, kv_len, window)[None, None, None],
                      s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        p = jnp.exp(s - m_safe[..., None])
        alpha = jnp.exp(jnp.where(jnp.isneginf(m), 0.0, m - m_safe))
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, hkv, g, sq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, sq), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, sq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(num_blocks))
    out = (acc / _safe_denom(l)[..., None]).reshape(b, hq, sq, d)
    out = out.transpose(0, 2, 1, 3).astype(q.dtype)
    lse = jnp.where(l > 0, m + jnp.log(_safe_denom(l)), _NEG_INF)  # [B,Hkv,G,Sq]
    return out, (q, k, v, out, lse, q_offset, kv_len)


def _fp_train_bwd(block_k, scale, window, res, do):
    q, k, v, out, lse, q_offset, kv_len = res
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    if skv % block_k:
        raise ValueError(f"flash backward requires skv % block_k == 0 "
                         f"(skv={skv}, block_k={block_k})")
    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d)
    doh = do.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d).astype(jnp.float32)
    outh = out.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d).astype(jnp.float32)
    delta = jnp.sum(doh * outh, axis=-1)  # [B,Hkv,G,Sq]
    lse_safe = jnp.where(jnp.isneginf(lse), 0.0, lse)
    q_pos = q_offset + jnp.arange(sq)
    num_blocks = skv // block_k
    kdt = k.dtype

    def body(dq, blk):
        start = blk * block_k
        kb = jax.lax.dynamic_slice_in_dim(k, start, block_k, 1).transpose(0, 2, 1, 3)
        vb = jax.lax.dynamic_slice_in_dim(v, start, block_k, 1).transpose(0, 2, 1, 3)
        k_pos = start + jnp.arange(block_k)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qh, kb,
                       preferred_element_type=jnp.float32) * scale
        mask = _fp_mask(q_pos, k_pos, kv_len, window)[None, None, None]
        # exp(-inf - 0) = 0 covers masked slots; lse_safe keeps the
        # all-masked rows (lse == -inf) NaN-free.
        p = jnp.where(mask, jnp.exp(s - lse_safe[..., None]), 0.0)
        dvb = jnp.einsum("bhgqk,bhgqd->bhkd", p.astype(doh.dtype), doh,
                         preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhgqd,bhkd->bhgqk", doh, vb,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None]) * scale
        dqb = jnp.einsum("bhgqk,bhkd->bhgqd", ds.astype(kdt), kb,
                         preferred_element_type=jnp.float32)
        dkb = jnp.einsum("bhgqk,bhgqd->bhkd", ds.astype(kdt), qh,
                         preferred_element_type=jnp.float32)
        return dq + dqb, (dkb, dvb)

    dq0 = jnp.zeros((b, hkv, g, sq, d), jnp.float32)
    dq, (dks, dvs) = jax.lax.scan(body, dq0, jnp.arange(num_blocks))
    dq = dq.reshape(b, hq, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)
    # [nblk, B, Hkv, Bk, d] -> [B, Skv, Hkv, d]
    dk = dks.transpose(1, 0, 3, 2, 4).reshape(b, skv, hkv, d).astype(k.dtype)
    dv = dvs.transpose(1, 0, 3, 2, 4).reshape(b, skv, hkv, d).astype(v.dtype)
    zero_i = np.zeros((), jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_i


_flash_prefill_train.defvjp(_fp_train_fwd, _fp_train_bwd)


# ---------------------------------------------------------------------------
# Dense decode partial
# ---------------------------------------------------------------------------


def full_decode(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                length: jnp.ndarray, sm_scale: float | None = None,
                extra_mask: jnp.ndarray | None = None):
    """Single-token decode attention over a cache prefix, with LSE.

    q: [B, Hq, d]; k, v: [B, Hkv, S, d]; length: [B] valid tokens.
    extra_mask: optional [B, S] bool ANDed into the validity mask (used for
    sliding-window lower bounds).
    Returns (out [B, Hq, d] f32, lse [B, Hq] f32, natural log).
    """
    b, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    qh = _gqa_reshape(q, hkv)  # [B,Hkv,G,d]
    scores = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                        preferred_element_type=jnp.float32) * scale
    valid = jnp.arange(s)[None, :] < length[:, None]  # [B,S]
    if extra_mask is not None:
        valid = valid & extra_mask
    scores = jnp.where(valid[:, None, None], scores, _NEG_INF)
    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(scores - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / _safe_denom(l)[..., None]
    lse = m_safe + jnp.log(_safe_denom(l))
    lse = jnp.where(jnp.isneginf(m), _NEG_INF, lse)
    return out.reshape(b, hq, d), lse.reshape(b, hq)


# ---------------------------------------------------------------------------
# LSH-sampled decode partials
# ---------------------------------------------------------------------------


def collision_mask(q_codes: jnp.ndarray, k_codes: jnp.ndarray) -> jnp.ndarray:
    """>=2-of-L-tables collision mask.

    q_codes: [B, Hq, L]; k_codes: [B, Hkv, L, S] (tables-minor layout so the
    int16 lane dim is the sequence). Returns bool [B, Hq, S]. Matches
    `(q == k).sum(-1) > 1` (reference `attnserver_dist.py:822`,
    `lsh.cc:272-283`).
    """
    b, hq, L = q_codes.shape
    hkv, s = k_codes.shape[1], k_codes.shape[3]
    g = hq // hkv
    qc = q_codes.astype(k_codes.dtype).reshape(b, hkv, g, L, 1)
    kc = k_codes[:, :, None]  # [B,Hkv,1,L,S]
    # int16 accumulator: a fully-aligned key can match all L=150 tables,
    # which would overflow int8.
    count = jnp.sum((qc == kc).astype(jnp.int16), axis=3,
                    dtype=jnp.int16)  # [B,Hkv,G,S]
    return (count >= 2).reshape(b, hq, s)


def lsh_masked_decode(q: jnp.ndarray, k_centered: jnp.ndarray, v: jnp.ndarray,
                      k_norm: jnp.ndarray, mask: jnp.ndarray,
                      length: jnp.ndarray, K: int, L: int,
                      debias: str = "exact"):
    """Dense masked formulation of LSH-sampled attention (accuracy oracle).

    q: [B, Hq, d] (un-normalized); k_centered/v: [B, Hkv, S, d];
    k_norm: [B, Hkv, S] norms of centered keys; mask: [B, Hq, S] sampled;
    length: [B] valid offload length.
    Returns (out [B, Hq, d] f32, lse [B, Hq] f32).
    """
    b, hq, d = q.shape
    hkv, s = k_centered.shape[1], k_centered.shape[2]
    g = hq // hkv
    qh = _gqa_reshape(q, hkv)
    raw = jnp.einsum("bhgd,bhsd->bhgs", qh, k_centered,
                     preferred_element_type=jnp.float32)
    q_norm = jnp.linalg.norm(qh.astype(jnp.float32), axis=-1)[..., None]  # [B,Hkv,G,1]
    kn = k_norm[:, :, None, :]  # [B,Hkv,1,S]
    if debias == "none":   # diagnostic: plain collision sampling, no reweight
        scores = raw / (d ** 0.5)
    else:
        scores = debias_scores(raw, q_norm, kn, d, K, L)  # [B,Hkv,G,S]
    valid = (jnp.arange(s)[None, :] < length[:, None])[:, None, None]  # [B,1,1,S]
    full_mask = mask.reshape(b, hkv, g, s) & valid
    scores = jnp.where(full_mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(scores - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / _safe_denom(l)[..., None]
    lse = m_safe + jnp.log(_safe_denom(l))
    lse = jnp.where(jnp.isneginf(m), _NEG_INF, lse)
    return out.reshape(b, hq, d), lse.reshape(b, hq)


def mask_to_budget_ids(mask: jnp.ndarray, budget: int):
    """Compact a sample mask [.., S] to top-`budget` token ids + validity.

    XLA top_k is stable, so the ids of set bits come out lowest-first.
    Truncation beyond `budget` drops the highest token ids (statistically
    immaterial at the default 6%-of-S budget vs ~2% expected nnz).
    Returns (ids [.., budget] int32, valid [.., budget] bool).
    """
    vals, ids = jax.lax.top_k(mask.astype(jnp.int8), budget)
    return ids.astype(jnp.int32), vals > 0


def lsh_sampled_decode(q: jnp.ndarray, k_centered: jnp.ndarray, v: jnp.ndarray,
                       k_norm: jnp.ndarray, ids: jnp.ndarray,
                       ids_valid: jnp.ndarray, K: int, L: int):
    """Budgeted-gather formulation of LSH-sampled attention.

    ids/ids_valid: [B, Hq, budget] sampled token ids per query head (already
    <2%-compacted). Gathers K/V rows then applies the same debiased
    estimator. Equals `lsh_masked_decode` whenever the budget covers nnz.
    """
    b, hq, d = q.shape
    hkv = k_centered.shape[1]
    g = hq // hkv
    budget = ids.shape[-1]
    qh = _gqa_reshape(q, hkv)
    idh = ids.reshape(b, hkv, g, budget)
    validh = ids_valid.reshape(b, hkv, g, budget)

    # Gather per (b, hkv): rows for all G query heads' id sets.
    def gather_rows(cache, idx):  # cache [S, d] or [S]; idx [G, budget]
        return cache[idx]

    kg = jax.vmap(jax.vmap(gather_rows))(k_centered, idh)   # [B,Hkv,G,budget,d]
    vg = jax.vmap(jax.vmap(gather_rows))(v, idh)            # [B,Hkv,G,budget,d]
    kng = jax.vmap(jax.vmap(gather_rows))(k_norm, idh)      # [B,Hkv,G,budget]

    raw = jnp.einsum("bhgd,bhgsd->bhgs", qh, kg,
                     preferred_element_type=jnp.float32)
    q_norm = jnp.linalg.norm(qh.astype(jnp.float32), axis=-1)[..., None]
    scores = debias_scores(raw, q_norm, jnp.maximum(kng, 1e-20), d, K, L)
    scores = jnp.where(validh, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(scores - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgs,bhgsd->bhgd", p.astype(vg.dtype), vg,
                     preferred_element_type=jnp.float32)
    out = out / _safe_denom(l)[..., None]
    lse = m_safe + jnp.log(_safe_denom(l))
    lse = jnp.where(jnp.isneginf(m), _NEG_INF, lse)
    return out.reshape(b, hq, d), lse.reshape(b, hq)
