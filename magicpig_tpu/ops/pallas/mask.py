"""Pallas bit-plane collision scan: packed >=2-of-L mask words.

Streams the packed signature planes through VMEM once and emits the
collision mask words — the retrieval half of the reference's CPU LSH engine
(`library/lsh/lsh.cc:210-288`) as a TPU kernel. Math identical to
`ops.bitcodes.collision_words` (bit-exact), but the XLA formulation runs at
~300 GB/s (fori-loop slicing) while this kernel streams at pipeline speed.

Layout: planes [B, Hkv, L*K, W] int32 (W = S/32), blocked over W; per block
and per query head: match_l = AND_k(planes[l,k] ^ (q_bit-1)), then the
(once, twice) log-tree for the >=2-of-L rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qsel_ref, planes_ref, out_ref, *, K: int, L: int):
    planes = planes_ref[0, 0]                           # [L*K, wb]
    qsel = qsel_ref[0, 0]                               # [G, L*K]
    g = qsel.shape[0]
    wb = planes.shape[-1]
    lp2 = 1
    while lp2 < L:
        lp2 *= 2

    for gi in range(g):
        mmf = planes ^ qsel[gi][:, None]                # [L*K, wb]
        mmf = mmf.reshape(L, K, wb)
        mm = mmf[:, 0, :]
        for kk in range(1, K):                          # AND over the K bits
            mm = mm & mmf[:, kk, :]
        # >=2-of-L via the static log-tree of the associative combine
        # (a1,b1)+(a2,b2) = (a1|a2, b1|b2|(a1&a2)).
        a = jnp.concatenate(
            [mm, jnp.zeros((lp2 - L, wb), jnp.int32)], axis=0)
        bcc = jnp.zeros((lp2, wb), jnp.int32)
        size = lp2
        while size > 1:
            half = size // 2
            a1, b1 = a[:half], bcc[:half]
            a2, b2 = a[half:size], bcc[half:size]
            a = a1 | a2
            bcc = b1 | b2 | (a1 & a2)
            size = half
        out_ref[0, 0, gi:gi + 1, :] = bcc[:1]


def _iq(b, h, c):
    return (b, h, 0, 0)


def _ipl(b, h, c):
    return (b, h, 0, c)


def _io(b, h, c):
    return (b, h, 0, c)


@functools.partial(jax.jit, static_argnames=("K", "L", "block_words",
                                             "interpret"))
def collision_words_pallas(q_bits: jax.Array, planes: jax.Array, K: int,
                           L: int, block_words: int = 512,
                           interpret: bool = False) -> jax.Array:
    """Packed >=2-of-L collision mask (see ops.bitcodes.collision_words).

    q_bits: [B, Hq, L, K] 0/1; planes: [B, Hkv, L, K, W] int32.
    Returns [B, Hq, W] int32.
    """
    b, hq, _, _ = q_bits.shape
    hkv, w = planes.shape[1], planes.shape[-1]
    g = hq // hkv
    wb = min(block_words, w)
    assert w % wb == 0, (w, wb)

    qsel = (q_bits.astype(jnp.int32) - 1).reshape(b, hkv, g, L * K)
    planes2 = planes.reshape(b, hkv, L * K, w)

    kernel = functools.partial(_kernel, K=K, L=L)
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, w // wb),
        in_specs=[
            pl.BlockSpec((1, 1, g, L * K), _iq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L * K, wb), _ipl, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, wb), _io, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, w), jnp.int32),
        interpret=interpret,
    )(qsel, planes2)
    return out.reshape(b, hq, w)
