"""Log-sum-exp merge of attention partials.

The decode step computes two (or more) attention partials over disjoint token
sets — e.g. the dense sink/local/generated partial and the LSH-sampled
partial — each returning (output, lse). They combine exactly:

    out = (o1 * e^(l1 - m) + o2 * e^(l2 - m)) / (e^(l1 - m) + e^(l2 - m))

This replaces the reference's `flashinfer.merge_state`
(`models/attnserver.py:308`). We use natural-log LSE throughout (the
reference exports base-2 to match FlashInfer, `sparse_attention.cc:237-239`
— an implementation detail we do not inherit).

A partial with no tokens must pass lse = -inf; it then contributes nothing.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_denom(l: jnp.ndarray) -> jnp.ndarray:
    """Zero denominator only occurs when all partials are empty (-inf lse);
    substitute 1 exactly (a 1e-38 floor is subnormal in f32 → 0/0 NaN)."""
    return jnp.where(l > 0, l, 1.0)


def merge_partials(outs, lses):
    """Merge N attention partials.

    outs: sequence of [..., d]; lses: sequence of [...] (natural-log LSE of
    the softmax denominator, including the max: lse = log sum exp(scores)).
    Returns (out [..., d], lse [...]).
    """
    lse = jnp.stack([l.astype(jnp.float32) for l in lses], axis=0)  # [N, ...]
    out = jnp.stack([o.astype(jnp.float32) for o in outs], axis=0)  # [N, ..., d]
    m = jnp.max(lse, axis=0)                                        # [...]
    # Guard the all-empty case: if every partial is -inf, emit zeros.
    safe_m = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.exp(lse - safe_m[None])                                 # [N, ...]
    denom = jnp.sum(w, axis=0)
    merged = jnp.sum(out * w[..., None], axis=0) / _safe_denom(denom)[..., None]
    merged_lse = safe_m + jnp.log(_safe_denom(denom))
    merged_lse = jnp.where(jnp.isneginf(m), -jnp.inf, merged_lse)
    return merged, merged_lse
