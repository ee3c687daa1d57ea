"""Decode-time cache state for the attention servers.

TPU redesign of the reference's split storage (`models/attnserver.py`):
the reference keeps sink/local/generated tokens in a GPU paged cache and
offloads the middle of the KV cache to CPU DRAM with bf16 mirrors + norms
(`attnserver.py:94-110,136-175`). On TPU everything lives in HBM as static
arrays; the "offload" region is simply the part of the cache that decode
touches only through the sparse estimator.

Layout notes:
  * per-layer arrays are TUPLES of [B, ...] leaves (one per layer in the
    dense / sparse group), NOT stacked — a stacked array forces XLA to
    materialize a full-layer temp for every `arr[i]` read inside the decode
    loop, which blew HBM at 96K context;
  * SimHash signatures are bit-plane packed int32 words [B, Hkv, L, K, W]
    (`ops.bitcodes`): 188 B/key instead of the reference's 16-bit codes
    (300 B/key) — less HBM and a 32-keys-per-op collision scan;
  * keys in LSH sparse layers are stored centered by `avg_k` (reference
    `attnserver.py:144-145,275`) — hot and offload alike, so the dense and
    sampled partials share a consistent score shift that cancels in the
    LSE merge. Baseline estimators (quest/topk/oracle_sampling) store raw
    keys and skip hashing state entirely;
  * `hot` = sink + local + generation buffer (reference `self.length`,
    `attnserver.py:25`).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from magicpig_tpu.config import LSHConfig, ModelConfig
from magicpig_tpu.ops.bitcodes import num_words

ArrayTuple = tuple[jax.Array, ...]


@flax.struct.dataclass
class DecodeState:
    """All attention-server state for one engine instance."""

    # Dense (full-attention) layers: per-layer token-folded
    # [B, Hkv, max_len/fold, d*fold] (fold = 128/d; a [.., S, d<128] layout
    # is lane-padded 128/d x by XLA and its decode consumers hoist padded
    # copies — folded storage is lane-perfect). With dense_quant == "int8"
    # the caches are int8 with fold-major f32 scales (empty tuples
    # otherwise), dequantized in-register by flash_decode.
    dense_k: ArrayTuple
    dense_v: ArrayTuple
    dense_k_scale: ArrayTuple  # per-layer [B,Hkv,fold,max_len/fold] f32
    dense_v_scale: ArrayTuple
    dense_len: jax.Array      # [B] i32 — valid tokens per request

    # Sparse layers — hot region (sink+local+generated):
    hot_k: ArrayTuple         # per-layer [B, Hkv, hot_cap, d]
    hot_v: ArrayTuple
    hot_len: jax.Array        # [B] i32

    # Sparse layers — offloaded middle (model dtype, or int8 when
    # offload_quant is set, with per-row f32 scales). With packed-int4 K
    # (`LSHConfig.packed_k4`): off_k is [B, Hkv, off_cap/(2*fold), 128]
    # nibble-packed bytes and off_k_scale rides the 2*fold-GROUP layout
    # [B, Hkv, 2*fold, off_cap/(2*fold)] (`ops/pack4.py`).
    off_k: ArrayTuple         # per-layer [B, Hkv, off_cap, d]
    off_v: ArrayTuple
    off_k_scale: ArrayTuple   # per-layer [B,Hkv,fold,off_cap/fold] f32
    # (int8 only; fold-major: [.., f, c] scales token c*fold + f — the
    # layout the Pallas scorer/attend kernels stream without a transpose)
    off_v_scale: ArrayTuple
    off_len: jax.Array        # [B] i32

    # LSH-only state (empty tuples for other estimators):
    k_norm: ArrayTuple        # per-layer [B,Hkv,fold,off_cap/fold] f32
                              # fold-major centered norms (scale layout)
    avg_k: ArrayTuple         # per-layer [B, Hkv, d] f32
    planes: ArrayTuple        # per-layer [B, Hkv, L, K, W] i32 bit-planes

    # Quest-only state (empty tuples otherwise):
    quest_min: ArrayTuple     # per-layer [B, Hkv, n_pages, d]
    quest_max: ArrayTuple

    pos: jax.Array            # [B] i32 — next absolute position
    step: jax.Array           # [] i32 — decode step counter (PRNG folding)


def tuple_set(t: ArrayTuple, i: int, value: jax.Array) -> ArrayTuple:
    return t[:i] + (value,) + t[i + 1:]


def hot_capacity(lsh: LSHConfig) -> int:
    cap = lsh.num_sink_tokens + lsh.num_local_tokens + lsh.generation_buffer
    return ((cap + 127) // 128) * 128  # lane-aligned


def offload_capacity(lsh: LSHConfig, max_length: int,
                     head_dim: int | None = None) -> int:
    cap = max(0, max_length - lsh.num_sink_tokens - lsh.num_local_tokens)
    align = 128
    if lsh.estimator == "lsh" and cap >= 4096:
        # The fused scan+attend kernel wants lane-aligned plane words
        # (wb = blk/32 multiple of 128 => blk multiple of 4096); aligning
        # the capacity guarantees `plane_block` finds one. Small contexts
        # keep the 128 alignment and take the two-stage path.
        align = 4096
    if lsh.estimator == "block_topk":
        # The scorer's fused ranking and the fallback's block reshape both
        # need the capacity to cover whole ranking blocks; packed-int4
        # storage additionally pairs rows within whole spans (the span IS
        # the ranking block, `config.packed_k4`).
        align = max(align, lsh.block_topk_block_size)
    return ((cap + align - 1) // align) * align


def init_state(config: ModelConfig, lsh: LSHConfig, batch_size: int,
               max_length: int) -> DecodeState:
    dense = lsh.dense_layers_for(config.num_hidden_layers)
    nd = len(dense)
    ns = config.num_hidden_layers - nd
    b = batch_size
    hkv = config.num_key_value_heads
    d = config.head_dim
    dt = config.dtype
    off_cap = offload_capacity(lsh, max_length, config.head_dim)
    L = max(lsh.L, 1)
    K = max(lsh.K, 1)

    def per_layer(n, shape, dtype):
        return tuple(jnp.zeros(shape, dtype) for _ in range(n))

    is_lsh = lsh.estimator == "lsh" and ns > 0
    is_quest = lsh.estimator == "quest" and ns > 0
    quant = lsh.offload_quantized and ns > 0
    off_dt = jnp.int8 if quant else dt
    # The offload cache is stored token-FOLDED [.., off_cap/fold, 128]
    # regardless of dtype: a [.., S, d<128] layout gets lane-padded 128/d x
    # by XLA (2x HBM at d=64) AND its Pallas consumers' reshape views then
    # materialize unpadded copies. The folded layout is lane-perfect and the
    # streaming kernels take it natively.
    fold = max(128 // d, 1)
    off_shape = (b, hkv, off_cap // fold, d * fold)
    # Packed-int4 K (block_topk only, ops/pack4.py): two folded rows per
    # byte-row; scales ride the 2*fold-GROUP layout the packed scorer
    # streams. V keeps the int8 folded layout.
    packed = quant and lsh.packed_k4(d)
    off_k_shape = ((b, hkv, off_cap // fold // 2, d * fold) if packed
                   else off_shape)
    k_scale_shape = ((b, hkv, 2 * fold, off_cap // (2 * fold)) if packed
                     else (b, hkv, fold, off_cap // fold))
    dfold = max(128 // d, 1)
    assert max_length % dfold == 0
    dense_shape = (b, hkv, max_length // dfold, d * dfold)
    n_pages = max(off_cap // lsh.quest_page_size, 1)

    dq = lsh.dense_quantized and nd > 0
    dense_dt = jnp.int8 if dq else dt
    return DecodeState(
        dense_k=per_layer(nd, dense_shape, dense_dt),
        dense_v=per_layer(nd, dense_shape, dense_dt),
        dense_k_scale=per_layer(nd if dq else 0,
                                (b, hkv, dfold, max_length // dfold),
                                jnp.float32),
        dense_v_scale=per_layer(nd if dq else 0,
                                (b, hkv, dfold, max_length // dfold),
                                jnp.float32),
        dense_len=jnp.zeros((b,), jnp.int32),
        hot_k=per_layer(ns, (b, hkv, hot_capacity(lsh), d), dt),
        hot_v=per_layer(ns, (b, hkv, hot_capacity(lsh), d), dt),
        hot_len=jnp.zeros((b,), jnp.int32),
        off_k=per_layer(ns, off_k_shape, off_dt),
        off_v=per_layer(ns, off_shape, off_dt),
        off_k_scale=per_layer(ns if quant else 0, k_scale_shape,
                              jnp.float32),
        off_v_scale=per_layer(ns if quant else 0,
                              (b, hkv, fold, off_cap // fold), jnp.float32),
        off_len=jnp.zeros((b,), jnp.int32),
        # Fold-major like the scales: the fused LSH kernel consumes
        # [B,Hkv,fold,cap/fold] directly. Storing unfolded cost a
        # per-layer transpose in the decode program whose T(8,128)
        # intermediate padded 16x (96 MB/layer at B=2/96K) — the round-5
        # lsh B=2 compile-OOM.
        k_norm=per_layer(ns if is_lsh else 0,
                         (b, hkv, fold, off_cap // fold), jnp.float32),
        avg_k=per_layer(ns if is_lsh else 0, (b, hkv, d), jnp.float32),
        planes=per_layer(ns if is_lsh else 0,
                         (b, hkv, L, K, num_words(off_cap)), jnp.int32),
        quest_min=per_layer(ns if is_quest else 0, (b, hkv, n_pages, d), dt),
        quest_max=per_layer(ns if is_quest else 0, (b, hkv, n_pages, d), dt),
        pos=jnp.zeros((b,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def layer_groups(config: ModelConfig, lsh: LSHConfig):
    """Map each layer index to ('dense'|'sparse', index-within-group)."""
    dense = set(lsh.dense_layers_for(config.num_hidden_layers))
    groups = []
    di = si = 0
    for i in range(config.num_hidden_layers):
        if i in dense:
            groups.append(("dense", di))
            di += 1
        else:
            groups.append(("sparse", si))
            si += 1
    return groups
