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
    (oraclesampling_cache.py:149-162). Returns out [B,Hq,d] f32."""
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
    return out.reshape(b, hq, d)
