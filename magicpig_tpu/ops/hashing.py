"""SimHash signatures for LSH-sampled attention.

Math (reference behavior, re-derived for TPU):
  * A bank of K*L random Gaussian directions hashes every (centered) key and
    every decode query: bit_j = [x . h_j > 0]
    (reference `models/attnserver.py:55,159-168,264-270`).
  * Bits are packed per table into a K-bit bucket code via the binary weights
    [2^0 .. 2^(K-1)] (reference `binary_pack`, `models/attnserver.py:56-57`).
  * A key is *sampled* for a query iff their codes match in >= 2 of the L
    tables (reference `library/lsh/lsh.cc:272-283`).

TPU notes: the projection is one [*, D] x [D, K*L] matmul (MXU); packing is
a tiny [*, K] x [K] contraction. Codes are stored as int32 in [0, 2^K).
Sign is scale-invariant so the reference's query L2-normalization before
hashing (`attnserver.py:265-266`) does not change the code; we hash raw
vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_hash_projections(key: jax.Array, head_dim: int, K: int, L: int,
                          dtype=jnp.float32) -> jax.Array:
    """Random Gaussian projection bank, shape [head_dim, K*L].

    Replicated across shards from a shared PRNG key (the TPU replacement for
    the reference's rank-0 broadcast, `attnserver_dist.py:279`).
    """
    return jax.random.normal(key, (head_dim, K * L), dtype=dtype)


def pack_bits(bits: jax.Array, K: int) -> jax.Array:
    """Pack sign bits [..., L*K] (or [..., L, K]) into int32 codes [..., L].

    bit j of table l has weight 2^j, matching the reference's `binary_pack`
    ordering (`models/attnserver.py:56,162-167`).
    """
    if bits.shape[-1] != K:
        bits = bits.reshape(*bits.shape[:-1], -1, K)
    weights = (2 ** jnp.arange(K, dtype=jnp.int32))
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def hash_codes(x: jax.Array, projections: jax.Array, K: int) -> jax.Array:
    """SimHash bucket codes for vectors x: [..., D] -> int32 [..., L].

    x must already be centered if key-centering applies (the reference
    subtracts the per-head mean key before hashing, `attnserver.py:144-145`).
    """
    proj = jnp.einsum(
        "...d,dh->...h",
        x.astype(jnp.float32),
        projections.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return pack_bits(proj > 0, K)
