"""Baseline sparse-attention estimators: Quest, TopK oracle, OracleSampling.

JAX re-implementations of the reference's evaluation baselines:
  * Quest (page-landmark top-k): per 16-token page, elementwise min/max key
    landmarks; page score = sum_d max(q*min, q*max); attend densely over the
    top-budget pages (`evaluations/RULER/pred/quest_cache.py:129-147`).
  * TopK (oracle): exact q.k scores, keep the top-n tokens
    (`topk_cache.py:127-141`).
  * OracleSampling: sample n tokens ~ softmax with replacement and average
    their values — the theoretical sampling upper bound
    (`oraclesampling_cache.py:149-162`).

All take GQA decode shapes (q [B,Hq,d]; k/v [B,Hkv,S,d]) and return
(out [B,Hq,d] f32, lse [B,Hq] f32) for LSE-merging with the hot partial,
except oracle sampling which returns a value-average (lse = -inf suppressed
merge is not meaningful; it returns its own output directly).

ACCURACY BASELINES ONLY — these compute the full dense score matrix and
then mask (O(S) FLOPs and bytes regardless of budget), exactly like the
reference's eval caches. Do NOT use them for throughput comparisons; the
performance-engineered paths are the Pallas block_topk scorer/attend
(`ops/pallas/{score,block_attend}.py`) and the fused LSH kernel
(`ops/pallas/lsh_decode.py`). `block_topk_decode` here doubles as the
XLA fallback for CPU/debug runs of the block_topk estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from magicpig_tpu.ops.attention import _gqa_reshape, _safe_denom

_NEG_INF = jnp.float32(-jnp.inf)


def _masked_softmax_wv(scores, mask, v):
    """scores/mask: [B,Hkv,G,S]; v: [B,Hkv,S,d] -> (out, lse)."""
    scores = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(scores - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / _safe_denom(l)[..., None]
    lse = jnp.where(jnp.isneginf(m), _NEG_INF, m_safe + jnp.log(_safe_denom(l)))
    b, hkv, g, d = out.shape[0], out.shape[1], out.shape[2], out.shape[3]
    return out.reshape(b, hkv * g, d), lse.reshape(b, hkv * g)


def quest_landmarks(k: jnp.ndarray, page_size: int):
    """Per-page elementwise min/max of keys. k: [B,Hkv,S,d] (S % page == 0).
    Returns (k_min, k_max): [B,Hkv,S/page,d] (quest_cache.py:49-63)."""
    b, hkv, s, d = k.shape
    pages = k.reshape(b, hkv, s // page_size, page_size, d)
    return pages.min(axis=3), pages.max(axis=3)


def quest_decode(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 k_min: jnp.ndarray, k_max: jnp.ndarray,
                 length: jnp.ndarray, page_size: int, budget_pages: int):
    """Quest: score pages by sum_d max(q*min, q*max), attend over top pages.

    (quest_cache.py:129-147: score = max(q*k_min, q*k_max).sum(-1), top-k
    pages gathered, dense attention over their tokens.)
    """
    b, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    n_pages = s // page_size
    qh = _gqa_reshape(q, hkv).astype(jnp.float32)             # [B,Hkv,G,d]
    # sum_d max(q*min, q*max) = q . mid + |q| . half  (max-min >= 0), which
    # keeps the landmark scoring on the MXU with no [.., P, d] temps.
    mid = (k_min.astype(jnp.float32) + k_max.astype(jnp.float32)) * 0.5
    half = (k_max.astype(jnp.float32) - k_min.astype(jnp.float32)) * 0.5
    page_score = (jnp.einsum("bhgd,bhpd->bhgp", qh, mid)
                  + jnp.einsum("bhgd,bhpd->bhgp", jnp.abs(qh), half))
    page_valid = (jnp.arange(n_pages) * page_size)[None, :] < length[:, None]
    page_score = jnp.where(page_valid[:, None, None], page_score, _NEG_INF)
    _, top_pages = jax.lax.top_k(page_score, budget_pages)    # [B,Hkv,G,bp]

    # Token-level mask from selected pages.
    page_of_token = jnp.arange(s) // page_size                # [S]
    sel = (page_of_token[None, None, None, None, :]
           == top_pages[..., None])                           # [B,Hkv,G,bp,S]
    mask = sel.any(axis=3)                                    # [B,Hkv,G,S]
    mask = mask & (jnp.arange(s)[None, None, None, :] < length[:, None, None, None])

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    scores = jnp.einsum("bhgd,bhsd->bhgs", qh.astype(k.dtype), k,
                        preferred_element_type=jnp.float32) * scale
    return _masked_softmax_wv(scores, mask, v)


def topk_decode(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                length: jnp.ndarray, n_tokens: int):
    """Oracle top-k: exact scores, softmax over the n highest
    (topk_cache.py:127-141)."""
    b, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    qh = _gqa_reshape(q, hkv)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    scores = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                        preferred_element_type=jnp.float32) * scale
    valid = (jnp.arange(s)[None, :] < length[:, None])[:, None, None]
    scores = jnp.where(valid, scores, _NEG_INF)
    thresh = jax.lax.top_k(scores, n_tokens)[0][..., -1:]     # nth score
    mask = scores >= thresh
    return _masked_softmax_wv(scores, mask & valid, v)


def oracle_sampling_decode(key: jax.Array, q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, length: jnp.ndarray,
                           n_samples: int):
    """Sample n tokens ~ exact softmax (with replacement), average values
    (oraclesampling_cache.py:149-162).

    Returns (out [B,Hq,d] f32, lse [B,Hq] f32): the value-average estimates
    the softmax-weighted mean over this region, and the exact LSE (computable
    since the oracle scores everything) weights it in the partial merge.
    """
    b, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    qh = _gqa_reshape(q, hkv)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    scores = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                        preferred_element_type=jnp.float32) * scale
    valid = (jnp.arange(s)[None, :] < length[:, None])[:, None, None]
    scores = jnp.where(valid, scores, _NEG_INF)
    idx = jax.random.categorical(key, scores, axis=-1,
                                 shape=(n_samples,) + scores.shape[:-1])
    g = hq // hkv

    def gather_one(vb, ib):  # vb [S,d]; ib [n, G]
        return vb[ib]        # [n, G, d]

    # outer vmap: B (v axis 0, idx axis 1); inner vmap: Hkv (axes 0, 1).
    gathered = jax.vmap(jax.vmap(gather_one, in_axes=(0, 1)),
                        in_axes=(0, 1))(v, idx)  # [B,Hkv,n,G,d]
    out = gathered.astype(jnp.float32).mean(axis=2)           # [B,Hkv,G,d]
    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    l = jnp.sum(jnp.exp(scores - m_safe[..., None]), axis=-1)
    lse = jnp.where(jnp.isneginf(m), _NEG_INF,
                    m_safe + jnp.log(_safe_denom(l)))
    return out.reshape(b, hq, d), lse.reshape(b, hq)


def block_topk_decode(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      length: jnp.ndarray, block_size: int,
                      budget_blocks: int, k_scale: jnp.ndarray | None = None,
                      v_scale: jnp.ndarray | None = None,
                      scores: jnp.ndarray | None = None):
    """Streaming exact-score block-top-k — the TPU-native fast estimator.

    Rationale: the reference's LSH machinery exists because its CPU cannot
    afford exact q.k over the cache (`README.md:37-45`); on TPU the MXU makes
    exact scoring free once K is streamed, and streaming K is half the cost
    of full attention (V is only needed for selected tokens). This op scores
    every key exactly, ranks `block_size`-token blocks by their max score
    over the GQA group, and attends over the top `budget_blocks` blocks —
    the same shape as the reference's Quest baseline (`quest_cache.py:
    129-147`) but with exact block scores instead of min/max landmark bounds
    (strictly better recall at equal budget), and exact softmax over the
    selected tokens.

    q: [B,Hq,d]; k/v: [B,Hkv,S,d] (bf16, or int8 with per-row f32
    k_scale/v_scale [B,Hkv,S] — int8 K halves the scoring stream, the
    dominant cost); S % block_size == 0.
    Returns (out [B,Hq,d] f32, lse [B,Hq] f32) over the selected tokens.
    """
    b, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    g = hq // hkv
    qh = _gqa_reshape(q, hkv)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    if scores is None:
        if k_scale is not None:
            raw = jnp.einsum("bhgd,bhsd->bhgs", qh.astype(jnp.bfloat16),
                             k.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            scores = raw * (k_scale[:, :, None, :] * scale)
        else:
            scores = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                                preferred_element_type=jnp.float32) * scale
    return block_topk_from_scores(scores, v, length, block_size,
                                  budget_blocks, v_scale=v_scale)


def block_topk_from_scores(scores: jnp.ndarray, v: jnp.ndarray,
                           length: jnp.ndarray, block_size: int,
                           budget_blocks: int,
                           v_scale: jnp.ndarray | None = None):
    """block_topk selection + attention from precomputed scaled scores
    [B,Hkv,G,S] f32 (e.g. the Pallas `ops.pallas.score.exact_scores`)."""
    b, hkv, g, s = scores.shape
    hq = hkv * g
    d = v.shape[-1]
    nb = s // block_size
    budget_blocks = min(budget_blocks, nb)
    valid = (jnp.arange(s)[None, :] < length[:, None])[:, None, None]
    scores = jnp.where(valid, scores, _NEG_INF)

    # Block ranking: max over the GQA group and the block's tokens, so all G
    # query heads share one gather per kv head.
    blk_score = scores.reshape(b, hkv, g, nb, block_size).max(axis=(2, 4))
    _, blk_ids = jax.lax.top_k(blk_score, budget_blocks)     # [B,Hkv,nb']

    def take_blocks(x, ids):  # x [nb, ...]; ids [nb']
        return x[ids]

    sblk = scores.reshape(b, hkv, g, nb, block_size).transpose(0, 1, 3, 2, 4)
    s_sel = jax.vmap(jax.vmap(take_blocks))(sblk, blk_ids)   # [B,Hkv,nb',G,bs]
    s_sel = s_sel.transpose(0, 1, 3, 2, 4).reshape(
        b, hkv, g, budget_blocks * block_size)
    v_sel = jax.vmap(jax.vmap(take_blocks))(
        v.reshape(b, hkv, nb, block_size, d), blk_ids)       # [B,Hkv,nb',bs,d]
    if v_scale is not None:
        vs_sel = jax.vmap(jax.vmap(take_blocks))(
            v_scale.reshape(b, hkv, nb, block_size), blk_ids)
        v_sel = (v_sel.astype(jnp.float32)
                 * vs_sel[..., None]).astype(jnp.bfloat16)
    v_sel = v_sel.reshape(b, hkv, budget_blocks * block_size, d)

    m = jnp.max(s_sel, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s_sel - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v_sel.dtype), v_sel,
                     preferred_element_type=jnp.float32)
    out = out / _safe_denom(l)[..., None]
    lse = jnp.where(jnp.isneginf(m), _NEG_INF,
                    m_safe + jnp.log(_safe_denom(l)))
    return out.reshape(b, hq, d), lse.reshape(b, hq)
