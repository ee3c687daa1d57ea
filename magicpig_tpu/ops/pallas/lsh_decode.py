"""Fused LSH-sampled decode over the offload region (streaming form).

Two-stage TPU-native fusion of the reference's CPU retrieval + sparse
attention pipeline (`lsh.cc:210-288` + `sparse_attention.cc:629-1125`):

  1. the >=2-of-L collision mask comes from the packed bit-plane scan
     (`ops.bitcodes.collision_words`, XLA) and is unpacked to a per-token
     int8 mask — 1 byte per (q-head, token), ~3 MB/layer at 96K: cheap;
  2. THIS kernel streams K, V, norms, and that mask through VMEM once and
     computes the debiased sampled partial:

       raw   = q @ K_blk^T                                (MXU)
       cos   = raw / (|q| |k|);  w = P[>=2 of L collide]  (debias — the
               reference `transform_kernel`, sparse_attention.cc:164-184)
       score = raw/sqrt(d) - log(w + 1e-4)
       online softmax over masked scores; WV accumulate   (softmax_kernel /
               wv_kernel equivalents, sparse_attention.cc:186-451)

Why streaming-masked instead of gathering the ~2% sampled rows: scattered
fetches on TPU cost ~16 ns of DMA issue per row; at ~61K sampled instances
per layer that exceeds the cost of streaming the whole cache, so the
bandwidth-optimal exact form reads everything once and masks (measured, see
BENCHMARKS.md).

head_dim < 128 is handled by token-folding (see ops/pallas/decode.py): the
[S, d] cache is viewed as [S/fold, 128] and the mask/norm streams are
pre-permuted into the same folded column order by the XLA wrapper.
Returns (out, lse, sampled_count) — the count feeds the reference's "Avg
Sparsity" metric (`attnserver_dist.py:525-527`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicpig_tpu.ops.bitcodes import (
    collision_words,
    plane_block,
    unpack_words,
    unpack_words_blocked,
    valid_words,
    valid_words_blocked,
)

_NEG = -1e30


def _acos(x):
    """Abramowitz & Stegun 4.4.45 polynomial arccos (|err| <= 2e-4 rad) —
    `acos` has no Pallas TPU lowering; the reference's kernel uses libm acos
    (`sparse_attention.cc:171`), and 2e-4 rad is far below the debias
    epsilon's effect."""
    ax = jnp.abs(x)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * -0.0187293)))
    return jnp.where(x < 0, math.pi - r, r)


def _kernel(q_ref, k_ref, v_ref, ksc_ref, vsc_ref, norm_ref, mask_ref,
            o_ref, lse_ref, cnt_ref, m_ref, l_ref, acc_ref, c_ref, *,
            fold: int, d: int, K: int, L: int, sm_scale: float,
            quant: bool, debias: str = "exact"):
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    # q is packed fold-major [GF, 128]: row f*G + g holds q_g in lanes
    # f*d..(f+1)*d (zeros elsewhere), so ONE MXU dot scores every fold slot
    # (the per-fold [G, d] dots of the first version left the MXU
    # row-starved — same finding as the block_topk scorer, score.py).
    q2 = q_ref[0, 0]                                    # [GF, 128]
    gf = q2.shape[0]
    g = gf // fold
    k = k_ref[0, 0]                                     # [rows, lane]
    v = v_ref[0, 0]
    norm3 = norm_ref[0, 0]                              # [fold, rows]
    mask2 = mask_ref[0, 0]                              # [GF, rows] i32
    # Row norms of q2 = |q_g| (each row holds exactly one copy of q_g).
    qn = jnp.sqrt(jnp.sum(q2.astype(jnp.float32) ** 2, axis=-1,
                          keepdims=True))               # [GF, 1]

    kd = jnp.bfloat16 if quant else k.dtype
    raw = jax.lax.dot_general(
        q2.astype(kd), k.astype(kd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [GF, rows]
    if quant:
        sc = ksc_ref[0, 0]                              # [fold, rows]
        ks8 = jnp.concatenate(
            [sc[f:f + 1] for f in range(fold) for _ in range(g)], axis=0)
        raw = raw * ks8
    kn8 = jnp.concatenate(
        [norm3[f:f + 1] for f in range(fold) for _ in range(g)], axis=0)

    # int8 vector compare has no lowering on this target ("Target does not
    # support this comparison" on vector<..xi8> cmpi) — widen first. The
    # HBM stream stays int8; the widening is in-register.
    sel = mask2.astype(jnp.int32) > 0                   # [GF, rows]
    if debias == "none":       # probe-only: bounds the debias VPU cost
        s = raw * sm_scale
    else:
        cosv = raw / jnp.maximum(qn * kn8, 1e-20)
        cosv = jnp.clip(cosv, -1.0, 1.0)
        if debias == "poly":
            # One deg-20 Horner chain replaces acos/pow-K/pow-(L-1)/log
            # (~60 VPU ops -> 20 FMAs on the full score tile); see
            # ops/debias.py for the fit and its error bound.
            from magicpig_tpu.ops.debias import eval_poly, log_weight_poly
            logw = eval_poly(cosv, log_weight_poly(K, L))
        else:
            p_bit = 1.0 - _acos(cosv) / math.pi
            p_tab = p_bit ** K
            q_tab = 1.0 - p_tab
            w = 1.0 - q_tab ** (L - 1) * (L * p_tab + q_tab)
            logw = jnp.log(w + 1e-4)
        s = raw * sm_scale - logw
    s = jnp.where(sel, s, _NEG)

    # One online-softmax update per grid step; per-head stats reduce the
    # fold row-groups with G-sublane slices (block_attend's pattern).
    m_prev = m_ref[:]                                   # [G, 128]
    mrow = jnp.max(s, axis=-1, keepdims=True)           # [GF, 1]
    mg = mrow[:g]
    for f in range(1, fold):
        mg = jnp.maximum(mg, mrow[f * g:(f + 1) * g])
    m_new = jnp.maximum(m_prev, mg)                     # [G, 128]
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
    m8 = jnp.concatenate([m_new[:, :1]] * fold, axis=0)  # [GF, 1]
    p = jnp.exp(s - m8) * sel.astype(jnp.float32)       # [GF, rows]
    lrow = jnp.sum(p, axis=-1, keepdims=True)           # [GF, 1]
    crow = jnp.sum(sel.astype(jnp.float32), axis=-1, keepdims=True)
    lg, cg = lrow[:g], crow[:g]
    for f in range(1, fold):
        lg = lg + lrow[f * g:(f + 1) * g]
        cg = cg + crow[f * g:(f + 1) * g]
    l_ref[:] = l_ref[:] * alpha + lg
    c_ref[:] = c_ref[:] + cg
    if quant:
        vsc = vsc_ref[0, 0]                             # [fold, rows]
        vs8 = jnp.concatenate(
            [vsc[f:f + 1] for f in range(fold) for _ in range(g)], axis=0)
        p = p * vs8   # scale rides p so V DMAs stay raw int8 (block_attend)
    vdt = jnp.bfloat16 if quant else v.dtype
    pv = jnp.zeros_like(acc_ref)
    for f in range(fold):
        pf = p[f * g:(f + 1) * g]                       # [G, rows]
        vf = v[:, f * d:(f + 1) * d]                    # [rows, d]
        pv = pv + jax.lax.dot_general(
            pf.astype(vdt), vf.astype(vdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(c == nc - 1)
    def _():
        l = l_ref[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
        m = m_ref[:, :1]
        lse = jnp.where(l > 0, m + jnp.log(safe), -jnp.inf)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        cnt_ref[0, 0] = jnp.broadcast_to(c_ref[:, :1], cnt_ref.shape[2:])


def _iq(b, h, c):
    return (b, h, 0, 0)


def _ikv(b, h, c):
    return (b, h, c, 0)


def _inorm(b, h, c):
    return (b, h, 0, c)


def _imask(b, h, c):
    return (b, h, 0, 0, c)


@functools.partial(jax.jit, static_argnames=("K", "L", "sm_scale",
                                             "block_tokens", "interpret",
                                             "batch_split", "debias"))
def lsh_masked_attention(q: jax.Array, k_centered: jax.Array, v: jax.Array,
                         k_norm: jax.Array, mask: jax.Array,
                         K: int, L: int, sm_scale: float | None = None,
                         block_tokens: int = 65536, interpret: bool = False,
                         k_scale: jax.Array | None = None,
                         v_scale: jax.Array | None = None,
                         batch_split: bool = False, debias: str = "exact"):
    """Streaming masked+debiased attention kernel (stage 2).

    mask: [B, Hq, S] bool/int8 (already length-masked). k_centered/v may be
    int8 (token-folded [B,Hkv,S/fold,128]) with per-token f32 k_scale/v_scale
    in the fold-major layout [B,Hkv,fold,S/fold] (`runtime/state.py`;
    [.., f, c] scales token c*fold + f), dequantized in-register.
    `batch_split=True` emits one B=1 `pallas_call` per request (identical
    program each, compiled once) instead of a single batched grid — the
    remote tpu_compile_helper on this toolchain crashes on the B>=2 fused
    graph while the B=1 program compiles and runs; the kernel streams the
    per-request cache either way, so the split costs only grid re-entry.
    Other args as in `lsh_fused_decode`. Returns (out, lse, sampled_count).
    """
    b, hq, d = q.shape
    hkv = k_centered.shape[1]
    s = k_centered.shape[2] * k_centered.shape[3] // d  # may arrive folded
    g = hq // hkv
    fold = max(128 // d, 1)
    gf = g * fold
    blk = min(block_tokens, s)
    # Cap the double-buffered K/V blocks at ~4 MB of VMEM each (same cap the
    # scorer converged to): at 96K/d=64/int8 that is 3 grid steps per
    # (request, kv-head) instead of 24 — each step past the first pays the
    # measured ~3 us small-constant-input stall (BENCHMARKS.md), so big
    # blocks are where the fused kernel's gap to its stream floor closes.
    lane = 128 if fold > 1 else d
    while (blk > fold * 32
           and (blk // fold) * lane * k_centered.dtype.itemsize > 4 << 20):
        blk //= 2
    while s % blk:
        blk //= 2
    assert s % blk == 0 and blk % (fold * 32) == 0, (s, blk, fold)
    rows = blk // fold
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None

    # q packed fold-major [GF, 128] (UNSCALED — the kernel needs raw q.k
    # for the debias cos and derives |q| from the packed rows).
    qh = q.reshape(b, hkv, g, d)
    q2 = jnp.zeros((b, hkv, gf, lane), q.dtype)
    for f in range(fold):
        q2 = jax.lax.dynamic_update_slice(q2, qh, (0, 0, f * g, f * d))
    k2 = k_centered.reshape(b, hkv, s // fold, lane)
    v2 = v.reshape(b, hkv, s // fold, lane)
    # Fold-permuted streams: token t = R*fold + f -> [.., f, R].
    if k_norm.ndim == 4:            # fold-major state layout (state.py)
        norm_f = k_norm.astype(jnp.float32)
    else:                           # token-order [B,Hkv,S] (tests/oracles)
        norm_f = k_norm.astype(jnp.float32).reshape(
            b, hkv, s // fold, fold).transpose(0, 1, 3, 2)
    # Mask in the scorer's fold-major row order (row f*G + g, col R) —
    # int8: the kernel only tests > 0, and the int32 stream was 4x the
    # bytes (12.6 MB r+w per layer at 96K).
    mask_f = mask.astype(jnp.int8).reshape(
        b, hkv, g, s // fold, fold).transpose(0, 1, 4, 2, 3).reshape(
        b, hkv, gf, s // fold)
    if quant:
        assert k_scale.shape == (b, hkv, fold, s // fold), k_scale.shape
        ksc_f = k_scale.astype(jnp.float32)  # already fold-major (state.py)
        vsc_f = v_scale.astype(jnp.float32)
    else:
        ksc_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)
        vsc_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)

    kernel = functools.partial(_kernel, fold=fold, d=d, K=K, L=L,
                               sm_scale=scale, quant=quant, debias=debias)

    def call(q2, k2, v2, ksc_f, vsc_f, norm_f, mask_f):
        bb = q2.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bb, hkv, s // blk),
            in_specs=[
                pl.BlockSpec((1, 1, gf, lane), _iq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rows, lane), _ikv,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rows, lane), _ikv,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, fold, rows), _inorm,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, fold, rows), _inorm,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, fold, rows), _inorm,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, gf, rows), _inorm,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, g, d), _iq, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _iq, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, 128), _iq, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bb, hkv, g, d), jnp.float32),
                jax.ShapeDtypeStruct((bb, hkv, g, 128), jnp.float32),
                jax.ShapeDtypeStruct((bb, hkv, g, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, 128), jnp.float32),
                pltpu.VMEM((g, d), jnp.float32),
                pltpu.VMEM((g, 128), jnp.float32),
            ],
            interpret=interpret,
        )(q2, k2, v2, ksc_f, vsc_f, norm_f, mask_f)

    if batch_split and b > 1:
        parts = [call(q2[r:r + 1], k2[r:r + 1], v2[r:r + 1],
                      ksc_f[r:r + 1], vsc_f[r:r + 1], norm_f[r:r + 1],
                      mask_f[r:r + 1]) for r in range(b)]
        out, lse, cnt = (jnp.concatenate(x, axis=0) for x in zip(*parts))
    else:
        out, lse, cnt = call(q2, k2, v2, ksc_f, vsc_f, norm_f, mask_f)
    return (out.reshape(b, hq, d), lse[..., 0].reshape(b, hq),
            cnt[..., 0].reshape(b, hq))


def lsh_fused_decode(q: jax.Array, k_centered: jax.Array, v: jax.Array,
                     k_norm: jax.Array, planes: jax.Array,
                     q_bits: jax.Array, length: jax.Array, K: int, L: int,
                     sm_scale: float | None = None,
                     block_tokens: int = 65536, interpret: bool = False,
                     k_scale: jax.Array | None = None,
                     v_scale: jax.Array | None = None,
                     batch_split: bool = False, debias: str = "exact"):
    """Full LSH-sampled decode partial: bit-plane collision scan (XLA) +
    streaming masked attention (Pallas).

    q: [B, Hq, d]; k_centered/v: [B, Hkv, S, d]; k_norm: [B, Hkv, S] f32;
    planes: [B, Hkv, L, K, S//32] int32; q_bits: [B, Hq, L, K]; length: [B].
    Returns (out [B,Hq,d] f32, lse [B,Hq] f32, sampled [B,Hq] f32 counts).
    """
    s = (k_centered.shape[2] * k_centered.shape[3]) // q.shape[-1]
    fold = max(128 // q.shape[-1], 1)
    blk = plane_block(s, fold)
    from magicpig_tpu.ops.pallas.lsh_fused import (fused2_supported,
                                                   lsh_fused_attention2)
    if blk and fused2_supported(s, fold, L, interpret):
        # One-kernel path: the collision scan runs in the attend kernel's
        # grid pass with VMEM-resident accumulators — planes stream once,
        # the mask never touches HBM (round-4's two-stage pipeline paid
        # ~118 MB of XLA accumulator re-touches + mask glue per layer,
        # results/probe_r4/csr_scan_96k.log).
        return lsh_fused_attention2(
            q, k_centered, v, k_norm, planes, q_bits, length, K, L,
            sm_scale=sm_scale, interpret=interpret, k_scale=k_scale,
            v_scale=v_scale, batch_split=batch_split, debias=debias)
    # Two-stage fallback (odd L, non-lane-aligned word counts): XLA scan +
    # streaming attend. `collision_words` is layout-agnostic; only the
    # valid/unpack step depends on whether planes are blocked.
    words = collision_words(q_bits, planes)              # [B, Hq, W]
    if blk:
        words = words & valid_words_blocked(length, s, blk, fold)[:, None]
        mask = unpack_words_blocked(words, blk, fold, s)
    else:
        words = words & valid_words(length, s // 32)[:, None]
        mask = unpack_words(words, s)                    # [B, Hq, S] bool
    return lsh_masked_attention(q, k_centered, v, k_norm, mask, K, L,
                                sm_scale=sm_scale, block_tokens=block_tokens,
                                interpret=interpret, k_scale=k_scale,
                                v_scale=v_scale, batch_split=batch_split,
                                debias=debias)
