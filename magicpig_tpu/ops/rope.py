"""Rotary position embeddings (Llama NEOX-style rotate-half).

Matches the reference's precomputed cos/sin caches with llama3 frequency
scaling and `attention_scaling` (`models/llama.py:111-124`) and the
rotate-half application (`models/utils.py:29-44`).
"""

from __future__ import annotations

import jax.numpy as jnp

from magicpig_tpu.config import ModelConfig, RopeScaling


def _scaled_inv_freq(inv_freq: jnp.ndarray, scaling: RopeScaling) -> jnp.ndarray:
    """HF `_compute_llama3_parameters`: piecewise frequency rescale."""
    low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
    high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    scaled = inv_freq / scaling.factor
    smooth = (scaling.original_max_position_embeddings / wavelen
              - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    mid = (1.0 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen > low_wavelen, scaled, inv_freq)
    return jnp.where((wavelen <= low_wavelen) & (wavelen >= high_wavelen), mid, out)


def rope_cos_sin(config: ModelConfig, max_len: int, dtype=jnp.float32):
    """Precompute (cos, sin) caches of shape [max_len, head_dim].

    Equivalent of the reference's cache build (`models/llama.py:114-124`):
    emb = concat(freqs, freqs); caches scaled by attention_scaling (1.0 for
    default and llama3 rope types).
    """
    d = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    if config.rope_scaling is not None and config.rope_scaling.rope_type == "llama3":
        inv_freq = _scaled_inv_freq(inv_freq, config.rope_scaling)
    pos = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)                  # [max_len, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)    # [max_len, d]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: jnp.ndarray) -> jnp.ndarray:
    """Apply rotate-half RoPE.

    x: [..., S, H, d] (seq then heads); positions: [..., S] int32.
    cos/sin: [max_len, d] caches.
    """
    c = cos[positions][..., None, :]  # [..., S, 1, d]
    s = sin[positions][..., None, :]
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)
