"""Token sampling: top-p (nucleus) with temperature, plus greedy.

Functional equivalent of the reference's `topp_temperature_decode`
(`models/utils.py:57-96`) and the `temperature < 0.1 -> argmax` rule
(`models/llama.py:343-346`), re-done as a pure jittable function with an
explicit PRNG key (TPU-native replacement for torch.multinomial, enabling
replicated sampling across shards instead of a token broadcast,
`llama_dist.py:377`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_p_sample(key: jax.Array, logits: jnp.ndarray, temperature: float = 0.6,
                 top_p: float = 0.9) -> jnp.ndarray:
    """Sample token ids from logits [..., vocab] -> int32 [...]."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # Keep tokens while the cumulative mass *before* them is < top_p
    # (always keeps the first token), matching the reference's shifted mask
    # (`models/utils.py:82-86`).
    keep = (cum - sorted_probs) < top_p
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    filtered = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)


def greedy_sample(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token(key: jax.Array, logits: jnp.ndarray, temperature: float,
                 top_p: float = 0.9) -> jnp.ndarray:
    """Dispatch greedy vs top-p like the reference generate loop."""
    if temperature < 0.1:
        return greedy_sample(logits)
    return top_p_sample(key, logits, temperature, top_p)
