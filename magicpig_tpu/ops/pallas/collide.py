"""Pallas >=2-of-L bit-plane collision scan.

Replaces the XLA `ops.bitcodes.collision_words` fori-loop on TPU: that
formulation streams the packed planes at ~180 GB/s effective (0.83
ms/layer at 96K — `results/probe_r4/csr_scan_96k.log`) because each of
the L=150 loop iterations re-touches the once/twice accumulators in HBM.
This kernel keeps the accumulators in registers: one grid pass over the
word axis, per step XOR/AND-ing all (L, K) plane rows against the query
sign words and tree-combining the per-table match words with the
associative >=2-of-L merge

    (o1, t1) (+) (o2, t2) = (o1|o2, t1|t2|(o1&o2))

so the planes stream is the ONLY HBM traffic (147 MB/layer at 96K,
~0.4 ms at the measured 440 GB/s int32 floor).

Same contract as `collision_words`: q_bits [B, Hq, L, K] 0/1 ints,
planes [B, Hkv, L, K, W] int32 -> [B, Hq, W] int32 collision words.
Tested bit-exact against the XLA scan (tests/test_bitcodes.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _combine(o1, t1, o2, t2):
    return o1 | o2, t1 | t2 | (o1 & o2)


def _kernel(qs_ref, pl_ref, o_ref, *, L: int, K: int, g: int):
    pk = pl_ref[0, 0]                       # [L, K, wblk] int32
    qs = qs_ref[0, 0]                       # [G, L, K] int32 (0 / -1)
    wblk = pk.shape[-1]
    for gi in range(g):
        # match word per table: AND over the K sign planes of
        # (plane ^ (q_bit - 1)); q_bit-1 is 0 for a 1-bit, -1 for a 0-bit.
        acc = jnp.full((L, wblk), -1, jnp.int32)
        for k in range(K):
            qcol = qs[gi, :, k:k + 1]                    # [L, 1]
            acc = acc & (pk[:, k, :] ^ jnp.broadcast_to(qcol, (L, wblk)))
        # >=2-of-L via associative tree over the table axis.
        once, twice = acc, jnp.zeros_like(acc)
        n = L
        while n > 1:
            h = n // 2
            o2, t2 = _combine(once[:h], twice[:h],
                              once[h:2 * h], twice[h:2 * h])
            if n % 2:
                o2 = jnp.concatenate([o2, once[2 * h:n]], axis=0)
                t2 = jnp.concatenate([t2, twice[2 * h:n]], axis=0)
                n = h + 1
            else:
                n = h
            once, twice = o2, t2
        o_ref[0, 0, gi] = twice[0]


@functools.partial(jax.jit, static_argnames=("word_block", "interpret"))
def collision_words_pallas(q_bits: jax.Array, planes: jax.Array,
                           word_block: int = 512,
                           interpret: bool = False) -> jax.Array:
    """Drop-in Pallas version of `bitcodes.collision_words` (module doc)."""
    b, hq, L, K = q_bits.shape
    hkv, W = planes.shape[1], planes.shape[-1]
    g = hq // hkv
    wblk = min(word_block, W)
    while W % wblk:
        wblk //= 2
    qsel = (q_bits.astype(jnp.int32) - 1).reshape(b, hkv, g, L, K)
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, K=K, g=g),
        grid=(b, hkv, W // wblk),
        in_specs=[
            pl.BlockSpec((1, 1, g, L, K), lambda b, h, c: (b, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, K, wblk), lambda b, h, c: (b, h, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, wblk), lambda b, h, c: (b, h, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # The G-unrolled [L, wblk] accumulator chains need ~17-38 MB
            # of scoped VMEM stack; the Mosaic default cap is 16 MB (the
            # chip has far more) — raise it rather than shrinking blocks,
            # which barely moves the stack size (collide_scan.log).
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qsel, planes)
    return out.reshape(b, hq, W)
