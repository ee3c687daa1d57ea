"""Pallas causal prefill attention: whole-prompt flash over the KV prefix.

The XLA `ops.attention.flash_prefill` is an online-softmax formulation, but
XLA materializes every [sub, block_k] score/probability intermediate in HBM
(~134 MB per block iteration at 96K) — measured 2.9 s/layer, ~10x the
compute floor. This kernel keeps the score block in VMEM: per (request,
kv-head, query-tile) grid step it double-buffers 512-token K/V chunks
through scratch (the `rescore_attend` DMA pattern), scores the q tile
against each fold-half of the token-folded K on the MXU, applies the
causal/length/sliding-window mask from iotas, and runs the chunk-batched
online softmax in registers. HBM traffic per layer drops to the K/V + q
streams themselves (the causal-triangle chunks are skipped, DMA included).

Reference mapping: this is the TPU-native equivalent of the reference's
chunked FlashInfer prefill (`models/llama.py:263-285`,
`single_prefill_with_kv_cache`) — same math as `flash_prefill`, which
remains the oracle (`tests/test_prefill_pallas.py`) and the ring-prefill
partial (`parallel/ring.py` needs per-shard LSE merging).

Layouts (d <= 128, fold = 128 // d):
  qt  [B, Hkv, nq, G*Tq, d]    — head-major query tiles: row g*Tq + t holds
      q for (head g, query i*Tq+t). Each fold-half f scores with one
      [G*Tq, d] x [rows, d] dot against k[:, f*d:(f+1)*d] (the lane-slice
      pattern the pv loop uses for V) — unlike the decode kernels' packed
      q2, the tile here is large enough that per-fold dots stay
      MXU-efficient and the fold^2 q duplication in HBM is avoided.
  kf/vf [B, Hkv, S/fold, 128]  — token-folded cache (row R holds tokens
      R*fold..R*fold+fold-1), the decode kernels' storage layout.
Score row-block f, column c of chunk ci ↔ token (ci*rows + c)*fold + f.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicpig_tpu.ops.pallas.block_attend import _NBUF, _NEG


def _kernel(len_ref, off_ref, q_ref, k_hbm, v_hbm, o_ref, *rest,
            fold: int, d: int, gtq: int, tq: int, rows: int, nchunks: int,
            sm_scale: float, window: int | None, with_lse: bool):
    if with_lse:
        lse_ref, kbuf, vbuf, sems, m_ref, l_ref, acc_ref = rest
    else:
        lse_ref = None
        kbuf, vbuf, sems, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    length = len_ref[b]
    q_off = off_ref[b]

    # Last useful chunk: the causal bound of this q-tile's final query,
    # clipped by the valid prefix length.
    tile_max_q = q_off + i * tq + tq - 1
    last_tok = jnp.minimum(tile_max_q, length - 1)
    last_chunk = jnp.maximum(last_tok // (rows * fold), 0)
    if window is not None:
        first_tok = jnp.maximum(q_off + i * tq - (window - 1), 0)
        first_chunk = first_tok // (rows * fold)
    else:
        first_chunk = jnp.int32(0)

    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, ci):
        return [pltpu.make_async_copy(
                    k_hbm.at[b, h, pl.ds(ci * rows, rows)],
                    kbuf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[b, h, pl.ds(ci * rows, rows)],
                    vbuf.at[slot], sems.at[slot, 1])]

    @pl.when(first_chunk <= last_chunk)
    def _():
        for op in dmas(first_chunk % _NBUF, first_chunk):
            op.start()

    q = q_ref[0, 0, 0]                                   # [GTq, d]

    def body(ci, _):
        @pl.when((ci >= first_chunk) & (ci <= last_chunk))
        def _():
            slot = ci % _NBUF

            @pl.when(ci + 1 <= last_chunk)
            def _():
                for op in dmas((ci + 1) % _NBUF, ci + 1):
                    op.start()

            for op in dmas(slot, ci):
                op.wait()
            k = kbuf[pl.ds(slot, 1)][0]                  # [rows, 128]
            v = vbuf[pl.ds(slot, 1)][0]
            # One [GTq, d] x [rows, d] dot per fold-half (row half f holds
            # tokens with token % fold == f), lane-slicing K exactly like
            # the pv dot slices V — half the MACs and fold^2 less q HBM
            # than a fold-packed q2 dot at this tile size. Each fold-half
            # runs its OWN online-softmax update (same math as treating it
            # as a separate chunk): peak Mosaic stack temporaries are
            # [GTq, rows], not [fold*GTq, rows] — the concatenated-folds
            # formulation overflowed the 16 MB scoped-vmem stack at the
            # production shape (G=4, Tq=512, rows=256, measured on v5e).
            col = jax.lax.broadcasted_iota(jnp.int32, (gtq, rows), 1)
            qpos = q_off + i * tq + jax.lax.broadcasted_iota(
                jnp.int32, (gtq, rows), 0) % tq
            for f in range(fold):
                raw = jax.lax.dot_general(
                    q, k[:, f * d:(f + 1) * d], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [GTq, rows]
                # token(col c) = (ci*rows + c)*fold + f
                tok = (ci * rows + col) * fold + f
                sel = (tok <= qpos) & (tok < length)
                if window is not None:
                    sel = sel & (qpos - tok < window)
                s = jnp.where(sel, raw * sm_scale, _NEG)

                m_prev = m_ref[:]                        # [GTq, 128]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
                p = jnp.exp(s - m_new[:, :1]) * sel.astype(jnp.float32)
                l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v[:, f * d:(f + 1) * d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [GTq, d]
                acc_ref[:] = acc_ref[:] * alpha + pv
                m_ref[:] = m_new
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    l = l_ref[:, :1]
    safe = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)
    if with_lse:
        # Per-query log-sum-exp (natural base, ring/decode merge math):
        # [GTq] transposed to lanes, broadcast over the 8-sublane tile.
        lse = jnp.where(l > 0, m_ref[:, :1] + jnp.log(safe), -jnp.inf)
        lse_ref[0, 0, 0] = jnp.broadcast_to(lse.reshape(1, gtq), (8, gtq))


def _iq(b, h, i, lens, offs):
    return (b, h, i, 0, 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "q_tile",
                                             "chunk_tokens", "window",
                                             "interpret", "return_lse"))
def flash_prefill_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                         length: jax.Array,
                         q_offset: jax.Array | None = None,
                         sm_scale: float | None = None,
                         q_tile: int = 512, chunk_tokens: int = 512,
                         window: int | None = None,
                         interpret: bool = False,
                         return_lse: bool = False):
    """Causal prefill attention of a query span against the KV prefix.

    q: [B, Sq, Hq, d] — queries at absolute positions q_offset..+Sq (the
    whole padded prompt when q_offset is None/0, one prefill chunk in the
    interleaved-admission path); k, v: [B, Skv, Hkv, d] cache buffers;
    length: [B] valid keys (key t >= length is masked; queries past length
    produce defined-but-unused rows). window: sliding-window size (query t
    attends (t-window, t]) or None. Returns [B, Sq, Hq, d] in q.dtype,
    plus natural-base LSE [B, Sq, Hq] f32 (-inf where nothing attended)
    when return_lse — the ring-prefill partial contract
    (`parallel/ring.py::_merge`). return_lse requires G*Tq % 128 == 0
    (the LSE tile stores queries on the lane axis).
    """
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    fold = max(128 // d, 1)
    assert d * fold == 128 and skv % fold == 0, (d, skv)
    tq = min(q_tile, sq)
    while sq % tq:
        tq //= 2
    ck = min(chunk_tokens, skv)
    while skv % ck or ck % fold:
        ck //= 2

    # Mosaic allocates kernel temporaries on a 16 MB scoped-vmem stack.
    # Estimate the step's peak: fixed buffers (q/out tiles, double-buffered
    # K/V, m/l stats, acc) + ~4 live [GTq, rows] f32 temporaries in the
    # online update (s, p, iotas). Shrink the K/V chunk first (re-streams
    # nothing, only adds grid steps), then the q tile (adds K/V re-reads),
    # until the estimate fits a 13 MB budget (3 MB headroom).
    esize = 2 if q.dtype == jnp.bfloat16 else 4
    _BUDGET = 13 * 2 ** 20

    def stack_est(tq_, rows_):
        gtq_ = g * tq_
        fixed = (gtq_ * d * (esize + q.dtype.itemsize)    # q + out tiles
                 + 2 * 2 * rows_ * 128 * esize            # K/V double-buffer
                 + 2 * gtq_ * 128 * 4                     # m, l stats
                 + gtq_ * d * 4)                          # acc
        return fixed + 4 * gtq_ * rows_ * 4

    while stack_est(tq, ck // fold) > _BUDGET and ck // fold > 8:
        ck //= 2
    while stack_est(tq, ck // fold) > _BUDGET and tq > 128:
        tq //= 2
    nq = sq // tq
    gtq = g * tq
    rows = ck // fold
    nchunks = skv // ck
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    if q_offset is None:
        q_offset = jnp.zeros((b,), jnp.int32)
    # Dtype-preserving: bf16 activations stream as bf16 (the production
    # engine dtype); f32 models (unit tests, accuracy evals) stay f32 so
    # the kernel is bit-comparable to the XLA flash_prefill oracle.
    dt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32

    # Head-major q tiles: [B, Hkv, nq, GTq, d] — no fold packing; the
    # kernel scores each fold-half with a lane-sliced K dot instead.
    qt = q.reshape(b, nq, tq, hkv, g, d).transpose(0, 3, 1, 4, 2, 5)
    qt = qt.reshape(b, hkv, nq, gtq, d).astype(dt)

    # Token-folded head-major K/V: [B, Hkv, Skv/fold, 128].
    kf = k.transpose(0, 2, 1, 3).reshape(b, hkv, skv // fold, 128).astype(dt)
    vf = v.transpose(0, 2, 1, 3).reshape(b, hkv, skv // fold, 128).astype(dt)

    if return_lse:
        assert gtq % 128 == 0, gtq

    kernel = functools.partial(
        _kernel, fold=fold, d=d, gtq=gtq, tq=tq, rows=rows,
        nchunks=nchunks, sm_scale=scale, window=window,
        with_lse=return_lse)
    out_specs = [pl.BlockSpec((1, 1, 1, gtq, d), _iq,
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b, hkv, nq, gtq, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, 1, 1, 8, gtq), _iq,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((b, hkv, nq, 8, gtq), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, nq),
            in_specs=[
                pl.BlockSpec((1, 1, 1, gtq, d), _iq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs if return_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((_NBUF, rows, 128), dt),
                pltpu.VMEM((_NBUF, rows, 128), dt),
                pltpu.SemaphoreType.DMA((_NBUF, 2)),
                pltpu.VMEM((gtq, 128), jnp.float32),
                pltpu.VMEM((gtq, 128), jnp.float32),
                pltpu.VMEM((gtq, d), jnp.float32),
            ],
        ),
        out_shape=out_shapes if return_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(length.astype(jnp.int32), q_offset.astype(jnp.int32), qt, kf, vf)

    out = res[0] if return_lse else res
    # [B, Hkv, nq, G*Tq, d] -> [B, Sq, Hq, d]
    out = out.reshape(b, hkv, nq, g, tq, d).transpose(0, 2, 4, 1, 3, 5)
    out = out.reshape(b, sq, hq, d).astype(q.dtype)
    if not return_lse:
        return out
    # [B, Hkv, nq, 8, G*Tq] (row-broadcast) -> [B, Sq, Hq] f32
    lse = res[1][:, :, :, 0, :].reshape(b, hkv, nq, g, tq)
    lse = lse.transpose(0, 2, 4, 1, 3).reshape(b, sq, hq)
    return out, lse
