"""Attention-server layer ops: fill (prefill-time) and decode (step-time).

Pure functions over `DecodeState`, equivalent to the reference's 6-method
server protocol `alloc_buffer / fill / build_table / plan / decode / clear`
(`models/attnserver.py:108-331`):
  * alloc/clear  -> `state.init_state` (static shapes, nothing to plan)
  * fill         -> `fill_dense_layer` / `fill_sparse_layer`
  * build_table  -> SimHash codes are stored directly; bucket tables for the
                    fast retrieval path are built by `ops.tables` (the
                    masked/sampled paths need only codes)
  * plan         -> folded away (XLA static shapes replace FlashInfer plans)
  * decode       -> `decode_dense_layer` / `decode_sparse_layer`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from magicpig_tpu.config import LSHConfig
from magicpig_tpu.ops.attention import (
    collision_mask,
    full_decode,
    lsh_masked_decode,
    lsh_sampled_decode,
    mask_to_budget_ids,
)
from magicpig_tpu.ops.hashing import hash_codes
from magicpig_tpu.ops.merge import merge_partials
from magicpig_tpu.runtime.state import DecodeState, tuple_set


def _write_request(buf: jax.Array, val: jax.Array, req: jax.Array):
    """Write `val` into buf[req, ..., :val.shape] (leading-aligned)."""
    idx = (req,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, val[None], idx)


def fill_dense_layer(state: DecodeState, di: int, req: jax.Array,
                     k_full: jax.Array, v_full: jax.Array,
                     true_len: jax.Array) -> DecodeState:
    """Store the full prefill K/V for a dense layer (reference
    `attnserver.py:119-123`). k_full/v_full: [P_pad, Hkv, d] seq-major."""
    kc = k_full.transpose(1, 0, 2)  # [Hkv, P_pad, d]
    vc = v_full.transpose(1, 0, 2)
    return state.replace(
        dense_k=tuple_set(state.dense_k, di,
                          _write_request(state.dense_k[di], kc, req)),
        dense_v=tuple_set(state.dense_v, di,
                          _write_request(state.dense_v[di], vc, req)),
        dense_len=state.dense_len.at[req].set(true_len),
    )


def fill_sparse_layer(state: DecodeState, si: int, req: jax.Array,
                      k_full: jax.Array, v_full: jax.Array,
                      true_len: jax.Array, projections: jax.Array,
                      lsh: LSHConfig) -> DecodeState:
    """Partition prefill K/V into sink/local (hot) + offload (sampled).

    Reference `attnserver.py:126-175`: center keys by the mean offload key,
    store centered-key norms, and SimHash-code every offload key. All writes
    here are static-shaped; validity is carried by `off_len`.
    """
    p_pad, hkv, d = k_full.shape
    sink, local = lsh.num_sink_tokens, lsh.num_local_tokens
    off_cap = state.off_k[si].shape[2]
    off_len = true_len - sink - local

    # Offload slice: everything from `sink` onward, padded to off_cap.
    # Tokens at positions >= true_len - local are masked out via off_len
    # (they live in the hot buffer instead).
    take = min(off_cap, p_pad - sink)
    off_k = jnp.zeros((off_cap, hkv, d), k_full.dtype)
    off_k = jax.lax.dynamic_update_slice(off_k, k_full[sink:sink + take], (0, 0, 0))
    off_v = jnp.zeros((off_cap, hkv, d), v_full.dtype)
    off_v = jax.lax.dynamic_update_slice(off_v, v_full[sink:sink + take], (0, 0, 0))

    valid = (jnp.arange(off_cap) < off_len)[:, None, None]  # [off_cap,1,1]
    off_k_f = off_k.astype(jnp.float32) * valid
    avg = off_k_f.sum(0) / jnp.maximum(off_len, 1)          # [Hkv, d] f32
    centered = (off_k_f - avg[None]) * valid                # zeros beyond len
    k_norm = jnp.linalg.norm(centered, axis=-1)             # [off_cap, Hkv]
    codes = hash_codes(centered, projections, lsh.K).astype(jnp.int16)
    codes = codes.transpose(1, 2, 0)                        # [Hkv, L, off_cap]

    # Hot region: sink + local, centered by the same avg (attnserver.py:144).
    local_k = jax.lax.dynamic_slice(k_full, (true_len - local, 0, 0),
                                    (local, hkv, d))
    local_v = jax.lax.dynamic_slice(v_full, (true_len - local, 0, 0),
                                    (local, hkv, d))
    hot_k = jnp.concatenate([k_full[:sink], local_k], axis=0).astype(jnp.float32)
    hot_k = (hot_k - avg[None]).astype(k_full.dtype)        # [sink+local,Hkv,d]
    hot_v = jnp.concatenate([v_full[:sink], local_v], axis=0)

    def pad_to(buf_leaf, val):  # val [cap', Hkv, ...] seq-major -> buf layout
        val = jnp.moveaxis(val, 1, 0)  # [Hkv, cap', ...]
        full = jnp.zeros(buf_leaf.shape[1:], val.dtype)
        return jax.lax.dynamic_update_slice(full, val,
                                            (0,) * full.ndim)

    def wr(bufs, i, val_seq_major):
        leaf = bufs[i]
        return tuple_set(bufs, i,
                         _write_request(leaf, pad_to(leaf, val_seq_major), req))

    return state.replace(
        off_k=wr(state.off_k, si, centered.astype(state.off_k[si].dtype)),
        off_v=wr(state.off_v, si, off_v),
        k_norm=wr(state.k_norm, si, k_norm),
        k_codes=tuple_set(state.k_codes, si,
                          _write_request(state.k_codes[si], codes, req)),
        avg_k=tuple_set(state.avg_k, si,
                        _write_request(state.avg_k[si],
                                       avg.astype(jnp.float32), req)),
        hot_k=wr(state.hot_k, si, hot_k),
        hot_v=wr(state.hot_v, si, hot_v),
        off_len=state.off_len.at[req].set(off_len),
        hot_len=state.hot_len.at[req].set(sink + local),
    )


def _append_per_request(cache: jax.Array, new: jax.Array,
                        lens: jax.Array) -> jax.Array:
    """cache: [B, Hkv, cap, d]; new: [B, Hkv, d]; lens: [B] write offsets."""
    def one(c, n, l):
        return jax.lax.dynamic_update_slice(c, n[:, None, :], (0, l, 0))
    return jax.vmap(one)(cache, new, lens)


def decode_dense_layer(state: DecodeState, di: int, q: jax.Array,
                       k_new: jax.Array, v_new: jax.Array):
    """Append + full attention over the whole prefix (reference
    `attnserver.py:235-259`). q: [B,Hq,d]; k/v_new: [B,Hkv,d]."""
    dense_k = _append_per_request(state.dense_k[di], k_new, state.dense_len)
    dense_v = _append_per_request(state.dense_v[di], v_new, state.dense_len)
    state = state.replace(dense_k=tuple_set(state.dense_k, di, dense_k),
                          dense_v=tuple_set(state.dense_v, di, dense_v))
    out, _ = full_decode(q, dense_k, dense_v, state.dense_len + 1)
    return out, state


def decode_sparse_layer(state: DecodeState, si: int, q: jax.Array,
                        k_new: jax.Array, v_new: jax.Array,
                        projections: jax.Array, lsh: LSHConfig):
    """LSH-sampled decode: hot dense partial + sampled offload partial,
    merged by LSE (reference `attnserver.py:261-312`).

    Returns (out [B,Hq,d] f32, state, sampled_frac scalar — the reference's
    "workload" observability metric, `attnserver_dist.py:525-527`).
    """
    b, hq, d = q.shape
    avg = state.avg_k[si]                                   # [B,Hkv,d] f32
    k_c = (k_new.astype(jnp.float32) - avg).astype(k_new.dtype)

    hot_k = _append_per_request(state.hot_k[si], k_c, state.hot_len)
    hot_v = _append_per_request(state.hot_v[si], v_new, state.hot_len)
    state = state.replace(hot_k=tuple_set(state.hot_k, si, hot_k),
                          hot_v=tuple_set(state.hot_v, si, hot_v))

    # Dense partial over sink/local/generated.
    o_hot, lse_hot = full_decode(q, hot_k, hot_v, state.hot_len + 1)

    # Sampled partial over the offload region.
    q_codes = hash_codes(q, projections, lsh.K)             # [B,Hq,L]
    mask = collision_mask(q_codes, state.k_codes[si])
    off_cap = state.off_k[si].shape[2]
    valid = jnp.arange(off_cap)[None, None, :] < state.off_len[:, None, None]
    mask = mask & valid
    if lsh.decode_mode == "sampled":
        budget = lsh.sample_budget(off_cap)
        ids, ids_valid = mask_to_budget_ids(mask, budget)
        o_smp, lse_smp = lsh_sampled_decode(
            q, state.off_k[si], state.off_v[si], state.k_norm[si], ids,
            ids_valid, lsh.K, lsh.L)
    else:
        o_smp, lse_smp = lsh_masked_decode(
            q, state.off_k[si], state.off_v[si], state.k_norm[si], mask,
            state.off_len, lsh.K, lsh.L)

    out, _ = merge_partials([o_hot, o_smp], [lse_hot, lse_smp])
    sampled_frac = mask.sum() / jnp.maximum(state.off_len.sum() * hq, 1)
    return out, state, sampled_frac
