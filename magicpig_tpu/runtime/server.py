"""Attention-server layer ops: fill (prefill-time) and decode (step-time).

Pure functions over `DecodeState`, equivalent to the reference's 6-method
server protocol `alloc_buffer / fill / build_table / plan / decode / clear`
(`models/attnserver.py:108-331`):
  * alloc/clear  -> `state.init_state` (static shapes, nothing to plan)
  * fill         -> `fill_dense_layer` / `fill_sparse_layer`
  * build_table  -> bit-plane signature build (`ops.bitcodes.build_planes`),
                    folded into fill (the fast path scans planes; no separate
                    bucket CSR needed)
  * plan         -> folded away (XLA static shapes replace FlashInfer plans)
  * decode       -> `decode_dense_layer` / `decode_sparse_layer`

`decode_sparse_layer` dispatches on the configured estimator, mirroring the
reference's server selection by K sign / Q flag (`llama_dist.py:122-133`,
`model_wrappers.py:25-32`): "lsh" (the system), "quest", "topk",
"oracle_sampling".
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from magicpig_tpu.config import LSHConfig
from magicpig_tpu.ops.attention import (
    full_decode,
    lsh_masked_decode,
    lsh_sampled_decode,
    mask_to_budget_ids,
)
from magicpig_tpu.ops.baselines import (
    block_topk_decode,
    oracle_sampling_decode,
    quest_decode,
    quest_landmarks,
    topk_decode,
)
from magicpig_tpu.ops.bitcodes import (
    build_planes,
    build_planes_blocked,
    collision_words,
    plane_block,
    unpack_words_blocked,
    valid_words_blocked,
    hash_bits,
    unpack_words,
    valid_words,
)
from magicpig_tpu.ops.merge import merge_partials
from magicpig_tpu.ops.quant import dequantize_rows, quantize_rows
from magicpig_tpu.runtime.state import DecodeState, tuple_set


def _off_cap(leaf: jax.Array, head_dim: int) -> int:
    """Offload token capacity of a (possibly token-folded int8) cache leaf."""
    return leaf.shape[2] * leaf.shape[3] // head_dim


def _write_request(buf: jax.Array, val: jax.Array, req: jax.Array):
    """Write `val` into buf[req, ..., :val.shape] (leading-aligned)."""
    idx = (req,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, val[None], idx)


def fill_dense_layer(state: DecodeState, di: int, req: jax.Array,
                     k_full: jax.Array, v_full: jax.Array,
                     true_len: jax.Array) -> DecodeState:
    """Store the full prefill K/V for a dense layer (reference
    `attnserver.py:119-123`). k_full/v_full: [P_pad, Hkv, d] seq-major.
    Dense caches are token-folded [Hkv, cap/fold, d*fold] (state.py);
    int8 with fold-major scales when dense_quant == "int8" (inferred from
    the state — empty dense_k_scale means exact)."""
    p_pad, hkv, d = k_full.shape
    rows, lane = state.dense_k[di].shape[2], state.dense_k[di].shape[3]
    fold = lane // d

    def fold_wr(bufs, val):  # val [P_pad, Hkv, d]
        folded = val.transpose(1, 0, 2).reshape(
            hkv, p_pad // fold, lane).astype(bufs[di].dtype)
        leaf = bufs[di]
        full = jnp.zeros(leaf.shape[1:], folded.dtype)
        full = jax.lax.dynamic_update_slice(full, folded, (0, 0, 0))
        return tuple_set(bufs, di, _write_request(leaf, full, req))

    def scale_wr(bufs, val):  # val [P_pad, Hkv] token-order scales
        leaf = bufs[di]                     # [B, Hkv, fold, cap/fold]
        folded = jnp.moveaxis(val.astype(jnp.float32), 1, 0).reshape(
            hkv, p_pad // fold, fold).transpose(0, 2, 1)
        full = jnp.zeros(leaf.shape[1:], jnp.float32)
        full = jax.lax.dynamic_update_slice(full, folded, (0, 0, 0))
        return tuple_set(bufs, di, _write_request(leaf, full, req))

    if state.dense_k_scale:
        k_q, k_sc = quantize_rows(k_full)
        v_q, v_sc = quantize_rows(v_full)
        return state.replace(
            dense_k=fold_wr(state.dense_k, k_q),
            dense_v=fold_wr(state.dense_v, v_q),
            dense_k_scale=scale_wr(state.dense_k_scale, k_sc),
            dense_v_scale=scale_wr(state.dense_v_scale, v_sc),
            dense_len=state.dense_len.at[req].set(true_len),
        )
    return state.replace(
        dense_k=fold_wr(state.dense_k, k_full),
        dense_v=fold_wr(state.dense_v, v_full),
        dense_len=state.dense_len.at[req].set(true_len),
    )


def _split_offload(state, si, k_full, v_full, true_len, lsh,
                   window: int | None = None):
    """Common sink/local/offload partition (reference `attnserver.py:126-148`).

    With a sliding `window` (Mistral, `mistral_ref.py:305`), the offload
    region is clipped at fill to global positions >= true_len - window:
    older tokens can never re-enter the window during generation, so the
    estimators simply never see them. (Decode advances the window past
    fill's clip by at most the generation buffer — a <=256-token sliver at
    the stale end whose keys are retained; exact for the dense partials.)

    Returns (off_k [off_cap,Hkv,d], off_v, off_len, hot_k [sink+local,Hkv,d],
    hot_v) — all un-centered; LSH centering happens in the caller.
    """
    p_pad, hkv, d = k_full.shape
    sink, local = lsh.num_sink_tokens, lsh.num_local_tokens
    off_cap = _off_cap(state.off_v[si], d)

    take = min(off_cap, p_pad - sink)
    if window is None:
        off_len = true_len - sink - local
        off_start = sink
        k_src, v_src = k_full, v_full
    else:
        off_start = jnp.maximum(sink, true_len - window)
        off_len = jnp.maximum(true_len - local - off_start, 0)
        # Pad so a dynamic start near the end never clamps backward (which
        # would silently re-admit out-of-window tokens as valid rows).
        pad = jnp.zeros((take, hkv, d), k_full.dtype)
        k_src = jnp.concatenate([k_full, pad], axis=0)
        v_src = jnp.concatenate([v_full, pad], axis=0)
    off_k = jnp.zeros((off_cap, hkv, d), k_full.dtype)
    off_k = jax.lax.dynamic_update_slice(
        off_k, jax.lax.dynamic_slice_in_dim(k_src, off_start, take, axis=0),
        (0, 0, 0))
    off_v = jnp.zeros((off_cap, hkv, d), v_full.dtype)
    off_v = jax.lax.dynamic_update_slice(
        off_v, jax.lax.dynamic_slice_in_dim(v_src, off_start, take, axis=0),
        (0, 0, 0))

    local_k = jax.lax.dynamic_slice(k_full, (true_len - local, 0, 0),
                                    (local, hkv, d))
    local_v = jax.lax.dynamic_slice(v_full, (true_len - local, 0, 0),
                                    (local, hkv, d))
    hot_k = jnp.concatenate([k_full[:sink], local_k], axis=0)
    hot_v = jnp.concatenate([v_full[:sink], local_v], axis=0)
    return off_k, off_v, off_len, hot_k, hot_v


def _pad_to(buf_leaf, val):
    """val [cap', Hkv, ...] seq-major -> zero-padded head-major buf layout."""
    val = jnp.moveaxis(val, 1, 0)  # [Hkv, cap', ...]
    full = jnp.zeros(buf_leaf.shape[1:], val.dtype)
    return jax.lax.dynamic_update_slice(full, val, (0,) * full.ndim)


def fill_sparse_layer(state: DecodeState, si: int, req: jax.Array,
                      k_full: jax.Array, v_full: jax.Array,
                      true_len: jax.Array, projections: jax.Array,
                      lsh: LSHConfig, window: int | None = None) -> DecodeState:
    """Partition prefill K/V into sink/local (hot) + offload, then build the
    estimator's retrieval state:
      * lsh   — center keys by the mean offload key, store centered-key
                norms, bit-plane SimHash signatures (`attnserver.py:126-175`)
      * quest — per-page min/max landmarks (`quest_cache.py:49-63`)
      * topk / oracle_sampling — raw K/V only
    `window`: sliding-window size — clips the offload region at fill
    (see `_split_offload`).
    """
    hkv, d = k_full.shape[1], k_full.shape[2]
    off_cap = _off_cap(state.off_v[si], d)
    off_k, off_v, off_len, hot_k, hot_v = _split_offload(
        state, si, k_full, v_full, true_len, lsh, window)

    def wr(bufs, i, val_seq_major):
        leaf = bufs[i]
        return tuple_set(bufs, i,
                         _write_request(leaf, _pad_to(leaf, val_seq_major),
                                        req))

    def wr_fold(bufs, i, val):                          # val [cap, Hkv]
        """Write a per-token column into fold-major storage
        [B, Hkv, fold, cap/fold] (the layout the fused kernels stream;
        see state.py k_norm/off_*_scale)."""
        leaf = bufs[i]
        _, lhkv, lfold, cols = leaf.shape
        v = jnp.moveaxis(val.astype(leaf.dtype), 1, 0)  # [Hkv, cap]
        folded = v.reshape(lhkv, cols, lfold).transpose(0, 2, 1)
        return tuple_set(bufs, i, _write_request(leaf, folded, req))

    if lsh.estimator == "lsh":
        valid = (jnp.arange(off_cap) < off_len)[:, None, None]
        off_k_f = off_k.astype(jnp.float32) * valid
        avg = off_k_f.sum(0) / jnp.maximum(off_len, 1)      # [Hkv, d] f32
        centered = (off_k_f - avg[None]) * valid            # zeros beyond len
        if lsh.offload_quantized:
            # Quantize first so the stored norms describe the keys decode
            # actually scores against (the debias cos must be consistent).
            off_k_q, k_scale = quantize_rows(centered, lsh.offload_k_bits)
            centered = dequantize_rows(off_k_q, k_scale, jnp.float32)
        k_norm = jnp.linalg.norm(centered, axis=-1)         # [off_cap, Hkv]
        # BLOCKED plane layout whenever the capacity admits one (always in
        # production — `offload_capacity` aligns lsh to 4096): the fused
        # scan+attend kernel streams it directly. Flat fallback otherwise.
        fold = max(128 // d, 1)
        blk = plane_block(off_cap, fold)
        if blk:
            planes = build_planes_blocked(centered, projections, lsh.K,
                                          blk, fold)         # [Hkv,L,K,W]
        else:
            planes = build_planes(centered, projections, lsh.K)
        hot_k = (hot_k.astype(jnp.float32) - avg[None]).astype(k_full.dtype)
        state = state.replace(
            k_norm=wr_fold(state.k_norm, si, k_norm),
            planes=tuple_set(state.planes, si,
                             _write_request(state.planes[si], planes, req)),
            avg_k=tuple_set(state.avg_k, si,
                            _write_request(state.avg_k[si],
                                           avg.astype(jnp.float32), req)),
        )
        off_k = centered
    elif lsh.estimator == "quest":
        # Mask padded rows to +/-max before the per-page min/max so the page
        # straddling off_len gets landmarks from its valid rows only (the
        # padding zeros would otherwise pull min/max toward 0). Fully
        # invalid pages get +/-max landmarks but are masked to -inf at
        # decode by off_len in `quest_decode`.
        valid_row = (jnp.arange(off_cap) < off_len)[:, None, None]
        big = float(jnp.finfo(off_k.dtype).max)  # storable in the cache dtype
        k_lo = jnp.where(valid_row, off_k.astype(jnp.float32), big)
        k_hi = jnp.where(valid_row, off_k.astype(jnp.float32), -big)
        kmin, _ = quest_landmarks(
            k_lo.transpose(1, 0, 2)[None], lsh.quest_page_size)
        _, kmax = quest_landmarks(
            k_hi.transpose(1, 0, 2)[None], lsh.quest_page_size)
        kmin = kmin.astype(off_k.dtype)
        kmax = kmax.astype(off_k.dtype)
        state = state.replace(
            quest_min=tuple_set(state.quest_min, si,
                                _write_request(state.quest_min[si],
                                               kmin[0], req)),
            quest_max=tuple_set(state.quest_max, si,
                                _write_request(state.quest_max[si],
                                               kmax[0], req)),
        )

    packed = lsh.offload_quantized and lsh.packed_k4(d)
    if lsh.offload_quantized:
        # Per-row symmetric quantization of the offload region (dense layers
        # and the hot buffer stay exact; see ops.quant). Scales are stored
        # fold-major ([.., f, c] scales token c*fold + f) so the Pallas
        # scorer/attend/lsh kernels stream them with no per-step transpose.
        # int4 coarsens K only (scores); V keeps the full int8 grid. For
        # block_topk+int4 at d>=64, K is additionally nibble-PACKED two
        # tokens per byte (`ops/pack4.py`) with scales in the 2*fold-GROUP
        # layout the packed scorer streams.
        off_k, k_scale = quantize_rows(off_k, lsh.offload_k_bits)
        off_v, v_scale = quantize_rows(off_v)

        wr_scale = wr_fold

        if packed:
            from magicpig_tpu.ops.pack4 import group_scales

            fold = max(128 // d, 1)
            ks_grp = group_scales(
                jnp.moveaxis(k_scale.astype(jnp.float32), 1, 0), fold)
            k_scale_wr = tuple_set(
                state.off_k_scale, si,
                _write_request(state.off_k_scale[si], ks_grp, req))
        else:
            k_scale_wr = wr_scale(state.off_k_scale, si, k_scale)
        state = state.replace(
            off_k_scale=k_scale_wr,
            off_v_scale=wr_scale(state.off_v_scale, si, v_scale),
        )

    # Offload caches are stored token-folded (state.py).

    def fold_wr(bufs, i, val):  # val [cap, Hkv, d] -> folded leaf layout
        rows, lane = bufs[i].shape[2], bufs[i].shape[3]
        folded = jnp.moveaxis(val.astype(bufs[i].dtype), 1, 0).reshape(
            hkv, rows, lane)
        return tuple_set(bufs, i, _write_request(bufs[i], folded, req))

    if packed:
        from magicpig_tpu.ops.pack4 import pack_rows

        fold = max(128 // d, 1)
        folded_k = jnp.moveaxis(off_k.astype(jnp.int8), 1, 0).reshape(
            hkv, off_cap // fold, d * fold)
        off_k_wr = tuple_set(
            state.off_k, si,
            _write_request(state.off_k[si], pack_rows(folded_k, fold), req))
    else:
        off_k_wr = fold_wr(state.off_k, si, off_k)

    return state.replace(
        off_k=off_k_wr,
        off_v=fold_wr(state.off_v, si, off_v),
        hot_k=wr(state.hot_k, si, hot_k),
        hot_v=wr(state.hot_v, si, hot_v),
        off_len=state.off_len.at[req].set(off_len),
        hot_len=state.hot_len.at[req].set(
            lsh.num_sink_tokens + lsh.num_local_tokens),
    )


def _append_per_request(cache: jax.Array, new: jax.Array,
                        lens: jax.Array) -> jax.Array:
    """cache: [B, Hkv, cap, d]; new: [B, Hkv, d]; lens: [B] write offsets."""
    def one(c, n, l):
        return jax.lax.dynamic_update_slice(c, n[:, None, :], (0, l, 0))
    return jax.vmap(one)(cache, new, lens)


def _append_folded(cache: jax.Array, new: jax.Array, lens: jax.Array,
                   d: int) -> jax.Array:
    """Append one token per request into a token-folded cache.

    cache: [B, Hkv, cap/fold, d*fold]; new: [B, Hkv, d]; lens: [B] write
    positions (token index t -> row t//fold, lanes (t%fold)*d..).
    """
    fold = cache.shape[-1] // d

    def one(c, n, t):
        return jax.lax.dynamic_update_slice(
            c, n[:, None, :], (0, t // fold, (t % fold) * d))

    return jax.vmap(one)(cache, new, lens)


def _append_scale(scales: jax.Array, new: jax.Array,
                  lens: jax.Array) -> jax.Array:
    """Append one token's per-head quant scale into a fold-major scale
    buffer. scales: [B, Hkv, fold, cap/fold]; new: [B, Hkv]; lens: [B]
    (token t -> row t % fold, column t // fold)."""
    fold = scales.shape[2]

    def one(s, n, t):
        return jax.lax.dynamic_update_slice(
            s, n[:, None, None].astype(s.dtype), (0, t % fold, t // fold))

    return jax.vmap(one)(scales, new, lens)


def decode_dense_layer(state: DecodeState, di: int, q: jax.Array,
                       k_new: jax.Array, v_new: jax.Array,
                       window: int | None = None,
                       use_pallas: str = "auto"):
    """Append + full attention over the whole prefix (reference
    `attnserver.py:235-259`). q: [B,Hq,d]; k/v_new: [B,Hkv,d].
    `window`: sliding-window lower bound (the query at index dense_len sees
    cache rows j with dense_len - j < window).
    `use_pallas`: "auto" = flash-decode on TPU for d<128; "on" forces it
    (interpret mode off-TPU); "off" forces the XLA einsum."""
    b, hq, d = q.shape
    quant = bool(state.dense_k_scale)
    if quant:
        k_q, k_sc = quantize_rows(k_new)                # [B,Hkv,d]/[B,Hkv]
        v_q, v_sc = quantize_rows(v_new)
        state = state.replace(
            dense_k_scale=tuple_set(
                state.dense_k_scale, di,
                _append_scale(state.dense_k_scale[di], k_sc,
                              state.dense_len)),
            dense_v_scale=tuple_set(
                state.dense_v_scale, di,
                _append_scale(state.dense_v_scale[di], v_sc,
                              state.dense_len)),
        )
        k_new, v_new = k_q, v_q
    dense_k = _append_folded(state.dense_k[di], k_new.astype(
        state.dense_k[di].dtype), state.dense_len, d)
    dense_v = _append_folded(state.dense_v[di], v_new.astype(
        state.dense_v[di].dtype), state.dense_len, d)
    state = state.replace(dense_k=tuple_set(state.dense_k, di, dense_k),
                          dense_v=tuple_set(state.dense_v, di, dense_v))
    # d == 128 runs fold=1 natively (bf16 exact / int8 4e-4 vs oracle);
    # the XLA fallback dequantizes the WHOLE cache to bf16 per step
    # (2x 200 MB/layer transients at 96K d=128 — the 3B/8B decode OOM).
    pallas_ok = d <= 128 and (
        use_pallas == "on"
        or (use_pallas == "auto"
            and jax.default_backend() not in ("cpu",)))
    if window is None and pallas_ok:
        # Pallas flash-decode reads the folded layout natively; the XLA
        # einsum would hoist a lane-padded 2x copy of the cache per step.
        # int8 dense caches dequantize in-register (fold-major scales).
        from magicpig_tpu.ops.pallas.decode import flash_decode

        out, _ = flash_decode(
            q, dense_k, dense_v, state.dense_len + 1, interpret=_interp(),
            k_scale=state.dense_k_scale[di] if quant else None,
            v_scale=state.dense_v_scale[di] if quant else None)
    else:
        hkv = dense_k.shape[1]
        ku = dense_k.reshape(b, hkv, -1, d)
        vu = dense_v.reshape(b, hkv, -1, d)
        if quant:
            ku = dequantize_rows(
                ku, _scale_tokens(state.dense_k_scale[di]), jnp.bfloat16)
            vu = dequantize_rows(
                vu, _scale_tokens(state.dense_v_scale[di]), jnp.bfloat16)
        extra = None
        if window is not None:
            s = ku.shape[2]
            extra = (jnp.arange(s)[None, :]
                     > (state.dense_len - window)[:, None])
        out, _ = full_decode(q, ku, vu, state.dense_len + 1,
                             extra_mask=extra)
    return out, state


def _off_kv(state: DecodeState, si: int, lsh: LSHConfig, dtype,
            head_dim: int):
    """Offload K/V unfolded to [B, Hkv, S, d] for the pure-XLA consumers
    (oracle paths), dequantized when int8. The Pallas fast paths read the
    folded storage directly instead."""
    k, v = state.off_k[si], state.off_v[si]
    b, hkv = k.shape[0], k.shape[1]
    k = k.reshape(b, hkv, -1, head_dim)       # unfold (row-major view)
    v = v.reshape(b, hkv, -1, head_dim)
    if lsh.offload_quantized:
        k = dequantize_rows(k, _scale_tokens(state.off_k_scale[si]), dtype)
        v = dequantize_rows(v, _scale_tokens(state.off_v_scale[si]), dtype)
    return k, v


def _scale_tokens(scale_folded: jax.Array) -> jax.Array:
    """Fold-major scales [B,Hkv,fold,cap/fold] -> token order [B,Hkv,cap]."""
    b, hkv, fold, cols = scale_folded.shape
    return scale_folded.transpose(0, 1, 3, 2).reshape(b, hkv, cols * fold)


def _use_pallas(lsh: LSHConfig, head_dim: int) -> bool:
    if lsh.use_pallas == "off":
        return False
    if lsh.use_pallas == "on":
        return True
    # auto: any head dim on TPU. Hardware parity was measured per head_dim
    # for every Pallas consumer (flash_decode, fused LSH, scorer +
    # block_attend) at d in {16, 32, 64} vs the XLA oracles — max err
    # ~1e-3 (bf16 matmul tolerance), collision counts exact; the round-1
    # fold>=4 lane-slicing mis-lowering no longer exists in the rewritten
    # q-packed kernels (BENCHMARKS.md round-2 notes).
    return jax.default_backend() not in ("cpu",)


def _interp() -> bool:
    """Pallas interpreter mode: exercised when the production kernel paths
    are forced on (use_pallas="on") without TPU hardware — the CPU-mesh
    multichip dryrun and the sharded-kernel tests run exactly the
    production call graph this way."""
    return jax.default_backend() in ("cpu",)


def _lsh_partial(state, si, q, projections, lsh):
    """LSH-sampled partial over the offload region; returns (out, lse, frac)."""
    b, hq, d = q.shape
    off_cap = _off_cap(state.off_v[si], d)
    w = state.planes[si].shape[-1]

    if lsh.decode_mode == "masked" and _use_pallas(lsh, d):
        # Fused streaming kernel: bit-plane scan (XLA) + masked+debiased
        # attention (Pallas), see ops/pallas/lsh_decode.py. With int8
        # offload, pass the raw folded cache + scales (in-register dequant).
        from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode

        quant = lsh.offload_quantized
        kk, vv = state.off_k[si], state.off_v[si]   # folded storage
        q_bits = hash_bits(q, projections, lsh.K)
        out, lse, cnt = lsh_fused_decode(
            q, kk, vv, state.k_norm[si], state.planes[si], q_bits,
            state.off_len, lsh.K, lsh.L, interpret=_interp(),
            k_scale=state.off_k_scale[si] if quant else None,
            v_scale=state.off_v_scale[si] if quant else None,
            # Batched (B>=2) single grid: the round-2 remote
            # tpu_compile_helper crash on the batched fused program is
            # gone on this round's toolchain (results/probe_r4/
            # lsh_scan_96k.log: B=2 batched grid compiles+runs), so the
            # per-request split — which doubled kernel dispatches per
            # layer at B=2 — is only a fallback (lsh.batch_split).
            batch_split=lsh.batch_split and b > 1,
            debias=lsh.lsh_debias)
        frac = cnt.sum() / jnp.maximum(state.off_len.sum() * hq, 1)
        return out, lse, frac

    off_k, off_v = _off_kv(state, si, lsh, jnp.bfloat16, d)
    q_bits = hash_bits(q, projections, lsh.K)               # [B,Hq,L,K]
    words = collision_words(q_bits, state.planes[si])       # [B,Hq,W]
    fold = max(128 // d, 1)
    blk = plane_block(off_cap, fold)
    if blk:   # blocked plane layout (same predicate as the fill)
        words = words & valid_words_blocked(state.off_len, off_cap, blk,
                                            fold)[:, None]
        mask = unpack_words_blocked(words, blk, fold, off_cap)
    else:
        words = words & valid_words(state.off_len, w)[:, None]
        mask = unpack_words(words, off_cap)                 # [B,Hq,off_cap]
    sampled = jnp.sum(jax.lax.population_count(words),
                      dtype=jnp.int32)
    frac = sampled / jnp.maximum(state.off_len.sum() * hq, 1)

    k_norm_tok = _scale_tokens(state.k_norm[si])   # token order [B,Hkv,cap]
    if lsh.decode_mode == "sampled":
        budget = lsh.sample_budget(off_cap)
        ids, ids_valid = mask_to_budget_ids(mask, budget)
        out, lse = lsh_sampled_decode(
            q, off_k, off_v, k_norm_tok, ids,
            ids_valid, lsh.K, lsh.L)
    else:
        out, lse = lsh_masked_decode(
            q, off_k, off_v, k_norm_tok, mask,
            state.off_len, lsh.K, lsh.L, debias=lsh.lsh_debias)
    return out, lse, frac


def _static_budget(off_cap: int, frac: float, floor: int = 16) -> int:
    return max(floor, min(off_cap, int(math.ceil(off_cap * frac))))


def _realized_frac(budget_tokens, off_len: jax.Array) -> jax.Array:
    """Workload metric for budgeted estimators: realized coverage, not the
    configured budget. Clamps the static budget to each request's valid
    offload region so the metric is comparable to the LSH path's exact
    sampled count and never exceeds 1.0 (reference workload tracking,
    `attnserver_dist.py:525-527`)."""
    covered = jnp.minimum(jnp.float32(budget_tokens),
                          off_len.astype(jnp.float32))
    return covered.mean() / jnp.maximum(off_len.astype(jnp.float32).mean(), 1)


def decode_sparse_layer(state: DecodeState, si: int, q: jax.Array,
                        k_new: jax.Array, v_new: jax.Array,
                        projections: jax.Array, lsh: LSHConfig,
                        window: int | None = None):
    """Sparse-layer decode: hot dense partial + estimator partial over the
    offload region, merged by LSE (reference `attnserver.py:261-312`).

    With a sliding `window`, sink tokens (global positions 0..sink-1) drop
    out of the hot partial once the decode position passes the window; the
    offload region was already window-clipped at fill. Local/generated hot
    tokens are always in-window (hot capacity << window, asserted in the
    engine).

    Returns (out [B,Hq,d] f32, state, sampled_frac scalar — the reference's
    "workload" observability metric, `attnserver_dist.py:525-527`).
    """
    b, hq, d = q.shape
    off_cap = _off_cap(state.off_v[si], d)

    if lsh.estimator == "lsh":
        avg = state.avg_k[si]                               # [B,Hkv,d] f32
        k_new = (k_new.astype(jnp.float32) - avg).astype(k_new.dtype)

    hot_k = _append_per_request(state.hot_k[si], k_new, state.hot_len)
    hot_v = _append_per_request(state.hot_v[si], v_new, state.hot_len)
    state = state.replace(hot_k=tuple_set(state.hot_k, si, hot_k),
                          hot_v=tuple_set(state.hot_v, si, hot_v))

    # Dense partial over sink/local/generated.
    extra = None
    if window is not None:
        hot_cap = state.hot_k[si].shape[2]
        idx = jnp.arange(hot_cap)[None, :]
        in_window = state.pos[:, None] - idx < window   # sink global pos = idx
        extra = (idx >= lsh.num_sink_tokens) | in_window
    o_hot, lse_hot = full_decode(q, hot_k, hot_v, state.hot_len + 1,
                                 extra_mask=extra)

    # Estimator partial over the offload region.
    if lsh.estimator == "lsh":
        o_off, lse_off, frac = _lsh_partial(state, si, q, projections, lsh)
    elif lsh.estimator == "quest":
        pages = _static_budget(off_cap // lsh.quest_page_size,
                               lsh.quest_budget_frac, floor=1)
        off_k, off_v = _off_kv(state, si, lsh, jnp.bfloat16, d)
        o_off, lse_off = quest_decode(
            q, off_k, off_v, state.quest_min[si],
            state.quest_max[si], state.off_len, lsh.quest_page_size, pages)
        frac = _realized_frac(pages * lsh.quest_page_size, state.off_len)
    elif lsh.estimator == "topk":
        n = _static_budget(off_cap, lsh.topk_budget_frac)
        off_k, off_v = _off_kv(state, si, lsh, jnp.bfloat16, d)
        o_off, lse_off = topk_decode(q, off_k, off_v, state.off_len, n)
        frac = _realized_frac(n, state.off_len)
    elif lsh.estimator == "block_topk":
        bs = lsh.block_topk_block_size
        blocks = _static_budget(off_cap // bs, lsh.block_topk_budget_frac,
                                floor=1)
        quant = lsh.offload_quantized
        packed = quant and lsh.packed_k4(d)
        k_scale = state.off_k_scale[si] if quant else None
        v_scale = state.off_v_scale[si] if quant else None
        off_k, off_v = state.off_k[si], state.off_v[si]
        fold = max(128 // d, 1)
        if _use_pallas(lsh, d):
            # Pallas fast path: the scorer reads the raw (folded int8, or
            # nibble-packed int4) cache once (XLA's einsum hoists a
            # lane-padded bf16 copy instead) and block_attend DMAs only the
            # selected blocks (XLA's gather moves the same bytes at
            # ~10 GB/s).
            from magicpig_tpu.ops.pallas.block_attend import block_attend
            from magicpig_tpu.ops.pallas.score import (
                exact_scores_ranked,
                length_mask,
            )

            nb = off_cap // bs
            # Fold-major scores ([B,Hkv,G*fold,S/fold]; row f*G+g, col c
            # scores token c*fold + f for head g): the layout the scorer
            # emits in one store per grid step and block_attend DMAs one
            # lane slice per block from — no transposed score copies
            # materialize. The length mask (tiny additive input) and the
            # per-block ranking max are FUSED into the scorer, so neither
            # the XLA where pass nor the block-max reduce re-reads the
            # [B,Hq,S] f32 scores. Packed-int4 K swaps in the 2*fold-GROUP
            # layout end to end (`ops/pack4.py`) — per-block ranking and
            # the attend are bijective over the same token blocks.
            if packed:
                from magicpig_tpu.ops.pack4 import group_length_mask

                mask = group_length_mask(state.off_len, off_cap, fold)
            else:
                mask = length_mask(state.off_len, off_cap, fold)
            if quant and lsh.block_topk_pipeline == "rescore":
                # Rank-then-rescore: pass 1 emits only per-block maxes (the
                # [B,Hq,S] f32 score array never touches HBM); pass 2
                # recomputes the selected blocks' scores in-kernel from the
                # same quantized K stream — bit-identical dots
                # (ops/pallas/rescore_attend.py). "store" keeps the
                # score-store pipeline (parity-tested equal).
                from magicpig_tpu.ops.pallas.rescore_attend import (
                    rescore_attend,
                )
                from magicpig_tpu.ops.pallas.score import block_rank

                blk_sc = block_rank(q, off_k, k_scale, mask, bs,
                                    interpret=_interp(), packed=packed)
                _, blk_ids = jax.lax.top_k(blk_sc, min(blocks, nb))
                o_off, lse_off = rescore_attend(
                    q, blk_ids, off_k, k_scale, off_v, v_scale,
                    state.off_len, bs, d, interpret=_interp(),
                    packed=packed)
            else:
                scores, blk_sc = exact_scores_ranked(
                    q, off_k, k_scale, mask, bs, interpret=_interp(),
                    packed=packed)
                _, blk_ids = jax.lax.top_k(blk_sc, min(blocks, nb))
                o_off, lse_off = block_attend(
                    scores, blk_ids, off_v, v_scale, bs, d,
                    interpret=_interp(), packed=packed)
        else:
            if packed:
                from magicpig_tpu.ops.pack4 import (
                    ungroup_scales,
                    unpack_rows,
                )

                off_k = unpack_rows(off_k, fold)
                k_scale_t = ungroup_scales(k_scale, fold)
            else:
                k_scale_t = _scale_tokens(k_scale) if quant else None
            off_k = off_k.reshape(b, off_k.shape[1], -1, d)  # unfold
            off_v = off_v.reshape(b, off_v.shape[1], -1, d)
            o_off, lse_off = block_topk_decode(
                q, off_k, off_v, state.off_len, bs, blocks,
                k_scale=k_scale_t,
                v_scale=_scale_tokens(v_scale) if quant else None)
        frac = _realized_frac(blocks * bs, state.off_len)
    elif lsh.estimator == "oracle_sampling":
        n = _static_budget(off_cap, lsh.os_budget_frac)
        key = jax.random.fold_in(jax.random.key(677232254), state.step)
        key = jax.random.fold_in(key, si)
        off_k, off_v = _off_kv(state, si, lsh, jnp.bfloat16, d)
        o_off, lse_off = oracle_sampling_decode(
            key, q, off_k, off_v, state.off_len, n)
        frac = _realized_frac(n, state.off_len)
    else:  # pragma: no cover
        raise ValueError(lsh.estimator)

    out, _ = merge_partials([o_hot, o_off], [lse_hot, lse_off])
    return out, state, frac
