"""Streaming dense decode attention (flash-decode) with LSE export.

The dense partial of every decode step: one query per request attends over a
cached prefix, returning (out, lse) for LSE-merging — the TPU-native
equivalent of the reference's FlashInfer `run_return_lse`
(`models/attnserver.py:292-296`) and of its CPU `full_attention`
(`library/sparse_attention/sparse_attention.cc:988-1037`).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid (B, Hkv, S/BLK); K/V stream HBM->VMEM via BlockSpec pipeline, the
    online-softmax state (m, l, acc) lives in VMEM scratch across the
    S-blocks of one (b, h) pair.
  * GQA: the G query heads of a kv head ride the sublane dim ([G, d] block),
    so one K/V stream serves all of them (reference GQA grouping,
    `sparse_attention.cc:992-996`).
  * head_dim < 128 would waste lanes (bf16 tiles are *x128), so the kernel
    reads K/V with `fold = 128 // d` tokens folded per 128-lane row — the
    [S, d] cache reinterpreted as [S/fold, 128] without moving data. Scores
    for the folded tokens come from `fold` lane-sliced matmuls.
  * per-request `length` masks the tail block exactly; fully-masked rows
    yield (out=0, lse=-inf), matching `ops.attention.full_decode`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, *rest, blk: int, fold: int,
                   d: int, sm_scale: float, quant: bool):
    if quant:   # scale refs present only on the int8 path
        ks_ref, vs_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    rows = blk // fold

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                                    # [G, d]
    k = k_ref[0, 0]                                    # [rows, lane]
    v = v_ref[0, 0]                                    # [rows, lane]
    g = q.shape[0]

    # Scores for each folded token slot: q @ k_slot^T  -> [G, rows].
    # int8 K dequantizes AFTER the dot (per-token scale rides the score
    # row, fold-major ks_ref [fold, rows]).
    parts = []
    for f in range(fold):
        ks = k[:, f * d:(f + 1) * d]                   # [rows, d]
        sf = jax.lax.dot_general(
            q, ks.astype(jnp.bfloat16) if quant else ks,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, rows]
        if quant:
            sf = sf * ks_ref[0, 0][f:f + 1, :]
        parts.append(sf)
    s = jnp.concatenate(parts, axis=-1) * sm_scale     # [G, fold*rows]

    # Token index of each score column: slot f covers tokens
    # c*blk + [f*rows : (f+1)*rows) ... wait: fold interleaves tokens
    # row r lanes [f*d:(f+1)*d] = token c*blk + r*fold + f.
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (g, fold * rows), 1)
    f_idx = r_ids // rows
    r_idx = r_ids % rows
    tok = c * blk + r_idx * fold + f_idx
    mask = (tok < len_ref[b]).astype(jnp.float32)      # [G, fold*rows]

    s = jnp.where(mask > 0, s, _NEG)
    m_prev = m_ref[:]                                  # [G, 128]
    m_cur = jnp.max(s, axis=-1, keepdims=True)         # [G, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
    p = jnp.exp(s - m_new[:, :1]) * mask               # [G, fold*rows]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    # WV: sum over tokens; token (r, f) value = v[r, f*d:(f+1)*d].
    # int8 V: the per-token scale multiplies p instead of V (identical
    # math, and the dot stays bf16xbf16 on the MXU).
    pv = jnp.zeros((g, d), jnp.float32)
    for f in range(fold):
        vs = v[:, f * d:(f + 1) * d]                   # [rows, d]
        pf = p[:, f * rows:(f + 1) * rows]             # [G, rows]
        if quant:
            pf = pf * vs_ref[0, 0][f:f + 1, :]
        pv = pv + jax.lax.dot_general(
            pf.astype(jnp.bfloat16 if quant else v.dtype),
            vs.astype(jnp.bfloat16) if quant else vs,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(c == nc - 1)
    def _():
        l = l_ref[:, :1]                               # [G, 1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
        m = m_ref[:, :1]
        lse = jnp.where(l > 0, m + jnp.log(safe), -jnp.inf)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _index_q(b, h, c, lens):
    return (b, h, 0, 0)


def _index_kv(b, h, c, lens):
    return (b, h, c, 0)


def _index_o(b, h, c, lens):
    return (b, h, 0, 0)


def _index_sc(b, h, c, lens):
    return (b, h, 0, c)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "block_tokens", "interpret"))
def flash_decode(q: jax.Array, k: jax.Array, v: jax.Array,  # noqa: F811
                 length: jax.Array, sm_scale: float | None = None,
                 block_tokens: int = 8192, interpret: bool = False,
                 k_scale: jax.Array | None = None,
                 v_scale: jax.Array | None = None):
    """Dense decode attention over a cache prefix (see module docstring).

    q: [B, Hq, d]; k, v: [B, Hkv, S, d] (or token-folded
    [B, Hkv, S/fold, 128]); length: [B].
    k_scale/v_scale: optional fold-major [B, Hkv, fold, S/fold] f32 scales
    for int8 k/v ([.., f, c] scales token c*fold + f, the
    `runtime/state.py` dense_quant layout) — dequantized in-register.
    Returns (out [B, Hq, d] f32, lse [B, Hq] f32).
    """
    b, hq, d = q.shape
    hkv = k.shape[1]
    s = k.shape[2] * k.shape[3] // d   # k may arrive token-folded
    g = hq // hkv
    fold = max(128 // d, 1)
    blk = min(block_tokens, s)
    while blk > fold * 32 and s % blk:   # cache length need not be a
        blk //= 2                        # power-of-two multiple of 8192
    assert s % blk == 0 and blk % fold == 0, (s, blk, fold)
    rows = blk // fold
    lane = 128 if fold > 1 else d
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None
    assert (v_scale is not None) == quant

    qh = q.reshape(b, hkv, g, d)
    k2 = k.reshape(b, hkv, s // fold, lane)
    v2 = v.reshape(b, hkv, s // fold, lane)
    inputs = [length.astype(jnp.int32), qh, k2, v2]
    in_specs = [
        pl.BlockSpec((1, 1, g, d), _index_q, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rows, lane), _index_kv,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rows, lane), _index_kv,
                     memory_space=pltpu.VMEM),
    ]
    if quant:
        assert k_scale.shape == (b, hkv, fold, s // fold), k_scale.shape
        inputs += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        in_specs += [pl.BlockSpec((1, 1, fold, rows), _index_sc,
                                  memory_space=pltpu.VMEM)] * 2

    kernel = functools.partial(_decode_kernel, blk=blk, fold=fold, d=d,
                               sm_scale=scale, quant=quant)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv, s // blk),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _index_o, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _index_o,
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, g, 128), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, hq, d), lse[..., 0].reshape(b, hq)
