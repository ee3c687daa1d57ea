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


# -- trace-time polynomial debias (round 4) --------------------------------
# log(w + eps) is a smooth function of cos alone for static (K, L). The
# exact chain above costs ~60 VPU ops per element (acos, pow-K, pow-(L-1),
# log) and runs on the FULL [G*fold, rows] tile of the streaming Pallas
# kernel; a degree-20 polynomial fit evaluates in 20 FMAs (f32 Horner is
# stable at deg 20; deg-28 power basis blows up). Max fit error 0.014 in
# log-weight (<1.5% weight ratio) -- far below the sampling noise the
# debias corrects for, and comparable to the 2e-4-rad in-kernel acos
# approximation the exact path already accepts.

import functools

import numpy as np

DEBIAS_EPS = 1e-4


def exact_log_weight(c: np.ndarray, K: int, L: int) -> np.ndarray:
    """log(w + eps) with the exact reference formula (numpy, f64)."""
    p_bit = 1.0 - np.arccos(np.clip(c, -1.0, 1.0)) / np.pi
    p = p_bit ** K
    q = 1.0 - p
    w = 1.0 - q ** (L - 1) * (L * p + q)
    return np.log(w + DEBIAS_EPS)


@functools.lru_cache(maxsize=8)
def log_weight_poly(K: int, L: int, deg: int = 20) -> tuple[float, ...]:
    """Power-basis coefficients (low -> high degree) of the Chebyshev fit
    of log(w + eps) over cos in [-1, 1]. Static per (K, L): computed once
    at trace time, embedded as kernel constants."""
    c = np.linspace(-1.0, 1.0, 100001)
    y = exact_log_weight(c, K, L)
    ch = np.polynomial.chebyshev.Chebyshev.fit(c, y, deg)
    coef = ch.convert(kind=np.polynomial.Polynomial).coef
    return tuple(float(a) for a in coef)


def eval_poly(c, coeffs):
    """Horner evaluation (jax or numpy arrays); c pre-clipped to [-1, 1]."""
    acc = c * 0 + coeffs[-1]
    for a in coeffs[-2::-1]:
        acc = acc * c + a
    return acc
