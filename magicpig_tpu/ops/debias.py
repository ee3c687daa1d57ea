"""Importance-sampling debias for LSH-sampled attention.

This is the estimator that lets ~2% sampled attention match full attention:
each sampled score is divided by its LSH collision probability (in log space,
subtracted). Formula (reference `transform_kernel`,
`library/sparse_attention/sparse_attention.cc:164-184`, and the torch oracle
`library/sparse_attention/test_sparse.py:72-79`):

    cos   = (q . k) / (|q| |k|)           (k centered by the mean key)
    p     = 1 - arccos(cos) / pi           (per-bit match probability)
    w     = 1 - (1 - p^K)^L - L (1 - p^K)^(L-1) p^K
            (probability of >= 2 of L table collisions)
    score = (q . k) / sqrt(d) - log(w + 1e-4)

All math in float32 (VPU); the matmuls that produce q.k stay bf16 on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def collision_weight(cos: jnp.ndarray, K: int, L: int) -> jnp.ndarray:
    """P[>=2 of L tables collide] for vectors at angle arccos(cos)."""
    cos = jnp.clip(cos.astype(jnp.float32), -1.0, 1.0)
    theta = jnp.arccos(cos)
    p_bit = 1.0 - theta / jnp.pi
    p_tab = p_bit**K                 # one table (all K bits) collides
    q_tab = 1.0 - p_tab
    # 1 - P[0 collisions] - P[exactly 1]; grouped like the reference kernel:
    # w = 1 - q^(L-1) * (L p + q)   (sparse_attention.cc:176-180)
    return 1.0 - q_tab ** (L - 1) * (L * p_tab + q_tab)


def debias_scores(raw_qk: jnp.ndarray, q_norm: jnp.ndarray, k_norm: jnp.ndarray,
                  head_dim: int, K: int, L: int) -> jnp.ndarray:
    """Debiased attention logits from raw (unscaled) q.k products.

    raw_qk: [..., n] float; q_norm: broadcastable [..., 1]; k_norm: [..., n]
    (norms of the *centered* keys, reference `attnserver.py:146`).
    """
    cos = raw_qk.astype(jnp.float32) / (
        q_norm.astype(jnp.float32) * k_norm.astype(jnp.float32)
    )
    w = collision_weight(cos, K, L)
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    return raw_qk.astype(jnp.float32) * scale - jnp.log(w + 1e-4)
