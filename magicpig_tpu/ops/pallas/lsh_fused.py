"""Fully-fused LSH decode: >=2-of-L collision scan + debiased attention
in ONE Pallas kernel.

Round-4 found the two-stage pipeline (XLA bit-plane scan -> int8 mask in
HBM -> streaming attend kernel) bandwidth-bound at ~1.4 ms/layer at 96K:
the XLA fori scan re-touches its once/twice accumulators in HBM every one
of the L=150 iterations (~118 MB of extra traffic on a 147 MB plane
stream, `results/probe_r4/csr_scan_96k.log`), and the mask unpack glue
runs as separate ops. This kernel streams planes in the SAME grid pass as
K/V and keeps all scan state in VMEM:

  per (request, kv-head, token-block) grid step:
    1. >=2-of-L scan over the block's plane words — two tables per
       fori iteration as a [2G, wb] tile (full 8-sublane occupancy; the
       round-4 `collide.py` attempt died on [L, wblk] accumulator trees
       spilling 17-38 MB of VMEM stack), merged at the end with the
       associative combine (o1,t1)+(o2,t2) = (o1|o2, t1|t2|(o1&o2));
    2. mask extraction as 32 static shift/ANDs — the BLOCKED plane
       layout (`ops.bitcodes` module comment) makes bit j of the match
       words a contiguous lane-aligned run of fold-major token slots,
       so no per-lane shifts or gathers;
    3. the debiased online-softmax attend of `lsh_decode._kernel`
       (reference math: retrieval `library/lsh/lsh.cc:265-284`, debias
       `library/sparse_attention/sparse_attention.cc:164-184`, softmax/WV
       `sparse_attention.cc:186-451`).

The collision mask never touches HBM; the HBM traffic per layer is the
plane stream + K/V/norm/scale stream, once. Requires the blocked plane
layout and even L (odd L falls back to the two-stage path).
Returns (out, lse, sampled_count) like `lsh_decode.lsh_masked_attention`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicpig_tpu.ops.bitcodes import WORD, plane_block

_NEG = -1e30


def fused2_supported(s: int, fold: int, L: int, interpret: bool) -> bool:
    """Whether the fully-fused kernel can serve this shape: even L (the
    two-tables-per-iteration scan), a valid block size, and lane-aligned
    words (wb % 128) on hardware (interpret mode exercises any shape)."""
    if L < 2 or L % 2:
        return False
    blk = plane_block(s, fold)
    if not blk or s % blk:
        return False
    return interpret or (blk // WORD) % 128 == 0


def _kernel(len_ref, q_ref, k_ref, v_ref, ksc_ref, vsc_ref, norm_ref,
            pl_ref, qsel_ref, o_ref, lse_ref, cnt_ref, m_ref, l_ref,
            acc_ref, c_ref, *, fold: int, d: int, K: int, L: int,
            sm_scale: float, quant: bool, debias: str, blk: int):
    b = pl.program_id(0)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    rows = blk // fold
    wb = blk // WORD
    jpf = WORD // fold

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    q2 = q_ref[0, 0]                                    # [GF, lane]
    gf = q2.shape[0]
    g = gf // fold

    # ---- stage 1: >=2-of-L collision scan over this block's planes ----
    # Two tables per iteration as one full-occupancy [2G, wb] tile; the
    # two half-streams accumulate (once, twice) independently and merge
    # with the associative >=2 combine afterwards.
    def pair_body(i, carry):
        once, twice = carry                             # [2G, wb]
        pk = pl_ref[0, 0, pl.ds(2 * i, 2)]              # [2, K, wb]
        qp = qsel_ref[0, 0, i]                          # [2G, K] 0/-1
        match = jnp.full((2 * g, wb), -1, jnp.int32)
        for k in range(K):
            # [p0 x G rows, p1 x G rows] via sublane broadcast + concat
            # (explicit form — jnp.repeat's gather lowering is not a
            # Mosaic-friendly path).
            prow = jnp.concatenate(
                [jnp.broadcast_to(pk[0, k][None], (g, wb)),
                 jnp.broadcast_to(pk[1, k][None], (g, wb))], axis=0)
            match = match & (prow ^ qp[:, k:k + 1])
        return once | match, twice | (once & match)

    z2 = jnp.zeros((2 * g, wb), jnp.int32)
    once, twice = jax.lax.fori_loop(0, L // 2, pair_body, (z2, z2))
    o1, t1 = once[:g], twice[:g]
    o2, t2 = once[g:], twice[g:]
    tw = t1 | t2 | (o1 & o2)                            # [G, wb]

    # ---- stage 2: peel the mask off the match words (32 static shifts;
    # stripe j covers fold slot j//jpf, lane chunk j%jpf — the blocked
    # layout's whole point) ----
    fparts = []
    for f in range(fold):
        chunks = [(tw >> (f * jpf + i)) & 1 for i in range(jpf)]
        fparts.append(jnp.concatenate(chunks, axis=1))  # [G, rows]
    sel_i = jnp.concatenate(fparts, axis=0)             # [GF, rows] 0/1
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (gf, rows), 1)
    f_row = jax.lax.broadcasted_iota(jnp.int32, (gf, rows), 0) // g
    tok = c * blk + lane_r * fold + f_row
    sel_i = jnp.where(tok < len_ref[b], sel_i, 0)
    sel = sel_i > 0

    # ---- stage 3: debiased online-softmax attend (lsh_decode._kernel) ----
    k = k_ref[0, 0]                                     # [rows, lane]
    v = v_ref[0, 0]
    norm3 = norm_ref[0, 0]                              # [fold, rows]
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

    if debias == "none":
        s = raw * sm_scale
    else:
        cosv = raw / jnp.maximum(qn * kn8, 1e-20)
        cosv = jnp.clip(cosv, -1.0, 1.0)
        if debias == "poly":
            from magicpig_tpu.ops.debias import eval_poly, log_weight_poly
            logw = eval_poly(cosv, log_weight_poly(K, L))
        else:
            ax = jnp.abs(cosv)
            r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
                1.5707288 + ax * (-0.2121144
                                  + ax * (0.0742610 + ax * -0.0187293)))
            acosv = jnp.where(cosv < 0, math.pi - r, r)
            p_bit = 1.0 - acosv / math.pi
            p_tab = p_bit ** K
            q_tab = 1.0 - p_tab
            w = 1.0 - q_tab ** (L - 1) * (L * p_tab + q_tab)
            logw = jnp.log(w + 1e-4)
        s = raw * sm_scale - logw
    s = jnp.where(sel, s, _NEG)

    m_prev = m_ref[:]                                   # [G, 128]
    mrow = jnp.max(s, axis=-1, keepdims=True)           # [GF, 1]
    mg = mrow[:g]
    for f in range(1, fold):
        mg = jnp.maximum(mg, mrow[f * g:(f + 1) * g])
    m_new = jnp.maximum(m_prev, mg)
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
    m8 = jnp.concatenate([m_new[:, :1]] * fold, axis=0)  # [GF, 1]
    p = jnp.exp(s - m8) * sel.astype(jnp.float32)
    lrow = jnp.sum(p, axis=-1, keepdims=True)
    crow = jnp.sum(sel_i.astype(jnp.float32), axis=-1, keepdims=True)
    lg, cg = lrow[:g], crow[:g]
    for f in range(1, fold):
        lg = lg + lrow[f * g:(f + 1) * g]
        cg = cg + crow[f * g:(f + 1) * g]
    l_ref[:] = l_ref[:] * alpha + lg
    c_ref[:] = c_ref[:] + cg
    if quant:
        vsc = vsc_ref[0, 0]
        vs8 = jnp.concatenate(
            [vsc[f:f + 1] for f in range(fold) for _ in range(g)], axis=0)
        p = p * vs8
    vdt = jnp.bfloat16 if quant else v.dtype
    pv = jnp.zeros_like(acc_ref)
    for f in range(fold):
        pf = p[f * g:(f + 1) * g]
        vf = v[:, f * d:(f + 1) * d]
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


def _iq(b, h, c, lens):
    return (b, h, 0, 0)


def _ikv(b, h, c, lens):
    return (b, h, c, 0)


def _isc(b, h, c, lens):
    return (b, h, 0, c)


def _ipl(b, h, c, lens):
    return (b, h, 0, 0, c)


def _iqs(b, h, c, lens):
    return (b, h, 0, 0, 0)


@functools.partial(jax.jit, static_argnames=("K", "L", "sm_scale",
                                             "interpret", "batch_split",
                                             "debias"))
def lsh_fused_attention2(q: jax.Array, k2: jax.Array, v2: jax.Array,
                         k_norm: jax.Array, planes: jax.Array,
                         q_bits: jax.Array, length: jax.Array,
                         K: int, L: int, sm_scale: float | None = None,
                         interpret: bool = False,
                         k_scale: jax.Array | None = None,
                         v_scale: jax.Array | None = None,
                         batch_split: bool = False, debias: str = "exact"):
    """One-kernel LSH decode partial (module doc).

    q: [B, Hq, d]; k2/v2: folded [B, Hkv, S/fold, lane] (int8 or model
    dtype); k_norm: [B, Hkv, S] f32; planes: BLOCKED [B, Hkv, L, K, S/32]
    int32; q_bits: [B, Hq, L, K] 0/1; length: [B] i32.
    """
    b, hq, d = q.shape
    hkv = k2.shape[1]
    s = k2.shape[2] * k2.shape[3] // d
    g = hq // hkv
    fold = max(128 // d, 1)
    gf = g * fold
    lane = 128 if fold > 1 else d
    blk = plane_block(s, fold)
    assert blk and s % blk == 0 and L % 2 == 0, (s, blk, L)
    rows = blk // fold
    wb = blk // WORD
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    quant = k_scale is not None

    k2 = k2.reshape(b, hkv, s // fold, lane)   # no-op when already folded
    v2 = v2.reshape(b, hkv, s // fold, lane)
    qh = q.reshape(b, hkv, g, d)
    q2 = jnp.zeros((b, hkv, gf, lane), q.dtype)
    for f in range(fold):
        q2 = jax.lax.dynamic_update_slice(q2, qh, (0, 0, f * g, f * d))
    if k_norm.ndim == 4:            # fold-major state layout (state.py)
        norm_f = k_norm.astype(jnp.float32)
    else:                           # token-order [B,Hkv,S] (tests/oracles)
        norm_f = k_norm.astype(jnp.float32).reshape(
            b, hkv, s // fold, fold).transpose(0, 1, 3, 2)
    if quant:
        ksc_f = k_scale.astype(jnp.float32)
        vsc_f = v_scale.astype(jnp.float32)
    else:
        ksc_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)
        vsc_f = jnp.zeros((b, hkv, fold, s // fold), jnp.float32)
    # Table-pair q selectors: [B, Hkv, L/2, 2G, K] with rows [:G] = table
    # 2i, rows [G:] = table 2i+1 — the layout pair_body consumes without
    # in-kernel transposes.
    qs = (q_bits.astype(jnp.int32) - 1).reshape(b, hkv, g, L, K)
    qs2 = qs.reshape(b, hkv, g, L // 2, 2, K).transpose(
        0, 1, 3, 4, 2, 5).reshape(b, hkv, L // 2, 2 * g, K)

    kernel = functools.partial(_kernel, fold=fold, d=d, K=K, L=L,
                               sm_scale=scale, quant=quant, debias=debias,
                               blk=blk)

    def call(q2, k2, v2, ksc_f, vsc_f, norm_f, planes, qs2, length):
        bb = q2.shape[0]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bb, hkv, s // blk),
                in_specs=[
                    pl.BlockSpec((1, 1, gf, lane), _iq),
                    pl.BlockSpec((1, 1, rows, lane), _ikv),
                    pl.BlockSpec((1, 1, rows, lane), _ikv),
                    pl.BlockSpec((1, 1, fold, rows), _isc),
                    pl.BlockSpec((1, 1, fold, rows), _isc),
                    pl.BlockSpec((1, 1, fold, rows), _isc),
                    pl.BlockSpec((1, 1, L, K, wb), _ipl),
                    pl.BlockSpec((1, 1, L // 2, 2 * g, K), _iqs),
                ],
                out_specs=(
                    pl.BlockSpec((1, 1, g, d), _iq),
                    pl.BlockSpec((1, 1, g, 128), _iq),
                    pl.BlockSpec((1, 1, g, 128), _iq),
                ),
                scratch_shapes=[
                    pltpu.VMEM((g, 128), jnp.float32),
                    pltpu.VMEM((g, 128), jnp.float32),
                    pltpu.VMEM((g, d), jnp.float32),
                    pltpu.VMEM((g, 128), jnp.float32),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bb, hkv, g, d), jnp.float32),
                jax.ShapeDtypeStruct((bb, hkv, g, 128), jnp.float32),
                jax.ShapeDtypeStruct((bb, hkv, g, 128), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(length.astype(jnp.int32), q2, k2, v2, ksc_f, vsc_f, norm_f,
          planes, qs2)

    if batch_split and b > 1:
        parts = [call(q2[r:r + 1], k2[r:r + 1], v2[r:r + 1],
                      ksc_f[r:r + 1], vsc_f[r:r + 1], norm_f[r:r + 1],
                      planes[r:r + 1], qs2[r:r + 1], length[r:r + 1])
                 for r in range(b)]
        out, lse, cnt = (jnp.concatenate(x, axis=0) for x in zip(*parts))
    else:
        out, lse, cnt = call(q2, k2, v2, ksc_f, vsc_f, norm_f, planes, qs2,
                             length)
    return (out.reshape(b, hq, d), lse[..., 0].reshape(b, hq),
            cnt[..., 0].reshape(b, hq))
