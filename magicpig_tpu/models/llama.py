"""Functional Llama-family model: parameter pytrees and per-layer compute.

Equivalent of the reference's flat-tensor runtime (`models/llama.py:10-61`,
`LLMLayer.init_parameters`) redone as JAX pytrees with *stacked* per-layer
weights [num_layers, ...] so layer segments can be lax.scan'ed and sharded
with one annotation. Weights are stored transposed for `x @ w` right-multiply
(TPU-friendly: the MXU consumes [*, in] x [in, out]).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from magicpig_tpu.config import ModelConfig
from magicpig_tpu.ops.norms import rms_norm
from magicpig_tpu.ops.rope import apply_rope


@flax.struct.dataclass
class QuantWeight:
    """int8 weight with per-output-channel scales (W8A8 deployment).

    `linear` quantizes activations per token on the fly and runs a native
    s8 x s8 -> s32 MXU dot: on TPU this halves the weight HBM stream AND
    doubles MXU rate vs bf16 — the decode step at small batch is
    weight-bandwidth-bound, so this converts directly to tokens/s, and it
    is what lets 8B-class models fit one 16 GB chip at long context.
    """

    q: jax.Array       # int8 [..., in, out]
    scale: jax.Array   # f32 [..., out]


def quantize_weight(w: jax.Array) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of [..., in, out]."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0            # [..., out]
    q = jnp.round(wf / jnp.maximum(scale[..., None, :], 1e-12))
    return QuantWeight(q=jnp.clip(q, -127, 127).astype(jnp.int8),
                       scale=scale)


W4_GROUP = 128   # input-group size for int4 scales == MXU contraction depth


@flax.struct.dataclass
class Quant4Weight:
    """int4 weight with per-(128-input-group, output-channel) scales (W4A8).

    Per-channel-only int4 loses too much precision; 128-input groups are
    the standard remedy AND exactly one MXU contraction depth, so the
    decode path runs one batched s8 x s8 dot per group with the group
    scale applied to the [g, M, out] partials. 8B-class weights drop to
    ~4.4 GB at rest — which is what puts Llama-3.1-8B @ 96K inside one
    16 GB chip with the block_topk4 estimator state (BENCHMARKS.md
    capacity table).

    Storage is NIBBLE-PACKED int8 (two input rows per byte), NOT jnp.int4:
    s4 arrays recurse in `device_put` at every dispatch boundary on this
    TPU backend (measured 2026-08-19: even an S4[] scalar dispatch dies
    with "Recursively calling jit"), so int4 data never crosses a jit
    boundary — it is unpacked in-register inside the graph.
    """

    q: jax.Array       # int8 [..., in//2, out]; group-local half-split:
    #                    packed row g*64 + j holds input g*128 + j (low
    #                    nibble) and g*128 + 64 + j (high), values in
    #                    [-7, 7] each — see ops/pallas/w4_matmul.py for
    #                    why (no-interleave in-register unpack; TP shard
    #                    boundaries at group granularity stay consistent)
    scale: jax.Array   # f32 [..., in//128, out]


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """int8 [-7..7] values [..., in, out] -> packed int8 [..., in//2, out]
    in the group-local half-split layout (Quant4Weight docstring)."""
    *lead, kin, out = q.shape
    qq = q.reshape(*lead, kin // W4_GROUP, 2, W4_GROUP // 2, out)
    lo = qq[..., 0, :, :]
    hi = qq[..., 1, :, :]
    packed = (lo & 0x0F) | (hi << 4)
    return packed.reshape(*lead, kin // 2, out).astype(jnp.int8)


def unpack_weight4(p: jax.Array) -> jax.Array:
    """Packed int8 [..., in//2, out] -> int8 [..., in, out] (sign-extended
    nibbles, inverse of `_pack_nibbles`). In-graph only; the unpacked form
    never persists in HBM beyond the consuming matmul's transient."""
    *lead, kp, out = p.shape
    half = W4_GROUP // 2
    lo = ((p << 4) >> 4).astype(jnp.int8)    # arithmetic: sign-extends
    hi = (p >> 4).astype(jnp.int8)
    st = jnp.stack([lo.reshape(*lead, kp // half, half, out),
                    hi.reshape(*lead, kp // half, half, out)], axis=-3)
    return st.reshape(*lead, kp * 2, p.shape[-1])


def quantize_weight4(w: jax.Array) -> Quant4Weight:
    """Symmetric int4 quantization of [..., in, out] with group-128 scales."""
    wf = w.astype(jnp.float32)
    *lead, kin, out = wf.shape
    assert kin % W4_GROUP == 0, (kin, W4_GROUP)
    g = kin // W4_GROUP
    wg = wf.reshape(*lead, g, W4_GROUP, out)
    scale = jnp.max(jnp.abs(wg), axis=-2) / 7.0              # [..., g, out]
    q = jnp.round(wg / jnp.maximum(scale[..., None, :], 1e-12))
    q = jnp.clip(q, -7, 7).reshape(*lead, kin, out).astype(jnp.int8)
    return Quant4Weight(q=_pack_nibbles(q), scale=scale)


_W4_UNPACK_BYTES = 1 << 25   # max unpacked-weight transient per chunk (32 MB)


def _w4_out_chunks(kin: int, out: int) -> int:
    """Smallest divisor of `out` keeping the unpacked [kin, out/nc] int8
    transient under _W4_UNPACK_BYTES. An 8B lm_head ([4096, 128256]) would
    otherwise materialize a 525 MB int8 (decode) / 1.05 GB bf16 (prefill)
    unpack per step — the allocation that OOMed the 8B@96K bench."""
    for nc in range(1, out + 1):
        if out % nc == 0 and (out // nc) * kin <= _W4_UNPACK_BYTES:
            return nc
    return out


def _linear4_part(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x @ W for one (packed q, scale) column slice; x [..., kin]."""
    kin = x.shape[-1]
    g, out = scale.shape
    m = x.size // kin
    if m >= 512:
        # Prefill-scale batches are compute-bound: one dequantized-weight
        # pass in the activation dtype (the [kin, out] transient is a
        # single weight block in VMEM-sized tiles, never persisted).
        wde = (unpack_weight4(q).astype(jnp.float32).reshape(
            g, W4_GROUP, out) * scale[:, None, :]).reshape(
            kin, out).astype(x.dtype)
        return x @ wde
    # Decode-scale: per-token int8 activations, one batched s8 x s8 MXU
    # dot over the 128-deep groups, group scales applied to the partials.
    xf = x.astype(jnp.float32).reshape(m, kin)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xq = jnp.round(xf / jnp.maximum(sx, 1e-12))
    xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
    xg = xq.reshape(m, g, W4_GROUP).transpose(1, 0, 2)       # [g, M, 128]
    wq = unpack_weight4(q).reshape(g, W4_GROUP, out)         # [g, 128, out]
    res = jax.lax.dot_general(xg, wq, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    outv = (res.astype(jnp.float32) * scale[:, None, :]).sum(0) * sx
    return outv.astype(x.dtype).reshape(*x.shape[:-1], out)


def _linear4(x: jax.Array, w: Quant4Weight) -> jax.Array:
    g, out = w.scale.shape
    kin = g * W4_GROUP
    m = x.size // kin
    if m < 512 and jax.default_backend() == "tpu":
        from magicpig_tpu.ops.pallas.w4_matmul import (w4_block_shapes,
                                                       w4_matmul)
        if w4_block_shapes(m, kin, out) is not None:
            # Decode-scale on TPU: stream the PACKED bytes once, unpack
            # in-register (no int8 weight transient, no activation
            # quantization — bf16 x bf16 -> f32 keeps the nibbles exact).
            y = w4_matmul(x.reshape(m, kin), w.q, w.scale)
            return y.astype(x.dtype).reshape(*x.shape[:-1], out)
    nc = _w4_out_chunks(kin, out)
    if nc == 1:
        return _linear4_part(x, w.q, w.scale)
    oc = out // nc
    qs = w.q.reshape(kin // 2, nc, oc).transpose(1, 0, 2)    # [nc, kin/2, oc]
    ss = w.scale.reshape(g, nc, oc).transpose(1, 0, 2)       # [nc, g, oc]
    ys = jax.lax.map(lambda a: _linear4_part(x, a[0], a[1]), (qs, ss))
    return jnp.moveaxis(ys, 0, -2).reshape(*x.shape[:-1], out)


def linear(x: jax.Array, w) -> jax.Array:
    """x @ w for a raw array, a QuantWeight (dynamic per-token activation
    quantization -> native int8 dot -> rescale), or a Quant4Weight
    (grouped-int4 weights, W4A8)."""
    if isinstance(w, Quant4Weight):
        return _linear4(x, w)
    if not isinstance(w, QuantWeight):
        return x @ w
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xq = jnp.round(xf / jnp.maximum(sx, 1e-12))
    xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, w.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * sx * w.scale).astype(x.dtype)


@flax.struct.dataclass
class LayerParams:
    """Stacked transformer-layer weights; leading dim = num_layers."""

    wq: jax.Array      # [N, hidden, Hq*d]   (each w* may be a QuantWeight)
    wk: jax.Array      # [N, hidden, Hkv*d]
    wv: jax.Array      # [N, hidden, Hkv*d]
    wo: jax.Array      # [N, Hq*d, hidden]
    w_gate: jax.Array  # [N, hidden, inter]
    w_up: jax.Array    # [N, hidden, inter]
    w_down: jax.Array  # [N, inter, hidden]
    ln_attn: jax.Array  # [N, hidden]
    ln_mlp: jax.Array   # [N, hidden]
    # Fused small-linear forms (`ModelConfig.fuse_small_linears`): qkv and
    # gate|up concatenated along OUT so the quantized decode path issues
    # ONE w4/w8 matmul instead of three/two — per-call fixed cost is what
    # the small projections pay at M=1 (VERDICT r4 item 5). Quantize-then-
    # concat, so results are bitwise equal to the separate calls. When
    # set, the corresponding unfused fields are None. Single-chip decode
    # only: the TP pspecs shard the UNFUSED layout (a contiguous shard of
    # the fused out-dim would cross the q/k/v part boundaries).
    wqkv: jax.Array | None = None      # [N, hidden, (Hq+2*Hkv)*d]
    w_gateup: jax.Array | None = None  # [N, hidden, 2*inter]

    def layer(self, i: int) -> "LayerParams":
        return jax.tree.map(lambda x: x[i], self)


@flax.struct.dataclass
class LlamaParams:
    embed: jax.Array      # [vocab, hidden]
    lm_head: jax.Array    # [hidden, vocab]
    final_ln: jax.Array   # [hidden]
    layers: LayerParams
    cos: jax.Array        # [max_len, head_dim] RoPE cache
    sin: jax.Array


def init_params(config: ModelConfig, key: jax.Array, max_len: int) -> LlamaParams:
    """Random-init parameters (bench/testing path when no checkpoint).

    Quantized configs create-and-quantize each weight leaf in ONE jitted
    call (XLA fuses the f32 init/round/pack transients), so the full bf16
    model never exists on the device — an 8B bf16 init (16 GB) cannot fit
    one chip at all, and even 3B died asynchronously in the eager
    quantize chain (surfacing as RESOURCE_EXHAUSTED at the next fetch)."""
    from magicpig_tpu.ops.rope import rope_cos_sin

    n = config.num_hidden_layers
    h = config.hidden_size
    hq = config.num_attention_heads * config.head_dim
    hkv = config.num_key_value_heads * config.head_dim
    inter = config.intermediate_size
    dt = config.dtype
    qbits = {"int8": 8, "int4": 4}.get(config.weight_quant, 0)

    ks = jax.random.split(key, 10)

    def w(k, shape, fan_in, quant=True):
        def make(kk):
            x = (jax.random.normal(kk, shape, jnp.float32)
                 * (fan_in ** -0.5)).astype(dt)
            if qbits and quant:
                return (quantize_weight4 if qbits == 4
                        else quantize_weight)(x)
            return x
        return jax.jit(make)(k)

    layers = LayerParams(
        wq=w(ks[0], (n, h, hq), h),
        wk=w(ks[1], (n, h, hkv), h),
        wv=w(ks[2], (n, h, hkv), h),
        wo=w(ks[3], (n, hq, h), hq),
        w_gate=w(ks[4], (n, h, inter), h),
        w_up=w(ks[5], (n, h, inter), h),
        w_down=w(ks[6], (n, inter, h), inter),
        ln_attn=jnp.ones((n, h), dt),
        ln_mlp=jnp.ones((n, h), dt),
    )
    embed = w(ks[7], (config.vocab_size, h), h, quant=False)
    if config.tie_word_embeddings:
        if qbits:
            qw = quantize_weight4 if qbits == 4 else quantize_weight
            lm_head = jax.jit(lambda e: qw(e.T.astype(dt)))(embed)
        else:
            lm_head = embed.T
    else:
        lm_head = w(ks[8], (h, config.vocab_size), h)
    cos, sin = rope_cos_sin(config, max_len)
    params = LlamaParams(
        embed=embed,
        lm_head=lm_head,
        final_ln=jnp.ones((h,), dt),
        layers=layers,
        cos=cos,
        sin=sin,
    )
    if qbits and config.fuse_small_linears:
        params = fuse_params(params)
    return params


def _concat_qw(ws) -> "QuantWeight | Quant4Weight":
    """Concatenate quantized weights along OUT (bitwise-equal math: both
    formats scale per output channel / (group, channel))."""
    if isinstance(ws[0], Quant4Weight):
        return Quant4Weight(q=jnp.concatenate([w.q for w in ws], axis=-1),
                            scale=jnp.concatenate([w.scale for w in ws],
                                                  axis=-1))
    return QuantWeight(q=jnp.concatenate([w.q for w in ws], axis=-1),
                       scale=jnp.concatenate([w.scale for w in ws], axis=-1))


def fuse_params(params: LlamaParams) -> LlamaParams:
    """Build the fused qkv / gate|up forms from quantized per-projection
    weights and drop the unfused leaves (see LayerParams docstring)."""
    lw = params.layers
    assert isinstance(lw.wq, (QuantWeight, Quant4Weight)), (
        "fuse_params applies to quantized weights (exact weights gain "
        "nothing: XLA fuses bf16 matmuls sharing an operand)")
    layers = lw.replace(
        wqkv=jax.jit(_concat_qw)((lw.wq, lw.wk, lw.wv)),
        w_gateup=jax.jit(_concat_qw)((lw.w_gate, lw.w_up)),
        wq=None, wk=None, wv=None, w_gate=None, w_up=None)
    return params.replace(layers=layers)


def quantize_params(params: LlamaParams, bits: int = 8) -> LlamaParams:
    """Quantize every matmul weight to int8 or grouped-int4 (embedding
    stays exact — it is a gather; a tied lm_head is quantized as its own
    copy, trading a little storage for halving the biggest per-step
    weight read). Stacked [N, in, out] leaves quantize per layer: the
    int4 scales are grouped along `in`, which the stack preserves.

    Each leaf quantizes in a DONATING jit: the exact original is freed as
    soon as its quantized form exists, so peak device memory stays at
    (exact params) + one leaf's transients, not 2x params."""
    base = {8: quantize_weight, 4: quantize_weight4}[bits]
    qw = jax.jit(base, donate_argnums=0)

    layers = params.layers
    layers = LayerParams(
        wq=qw(layers.wq),
        wk=qw(layers.wk),
        wv=qw(layers.wv),
        wo=qw(layers.wo),
        w_gate=qw(layers.w_gate),
        w_up=qw(layers.w_up),
        w_down=qw(layers.w_down),
        ln_attn=layers.ln_attn,
        ln_mlp=layers.ln_mlp,
    )
    return params.replace(layers=layers,
                          lm_head=qw(params.lm_head))


def qkv_proj(lp: LayerParams, config: ModelConfig, hidden: jax.Array,
             positions: jax.Array, cos: jax.Array, sin: jax.Array):
    """RMSNorm + QKV projection + RoPE for one layer.

    hidden: [B, S, h]; positions: [B, S].
    Returns q [B, S, Hq, d], k [B, S, Hkv, d], v [B, S, Hkv, d].
    (reference `pre_attention_compute` + rotary, `models/llama.py:138-206`)
    """
    b, s, h = hidden.shape
    d = config.head_dim
    x = rms_norm(hidden, lp.ln_attn, config.rms_norm_eps)
    if lp.wqkv is not None:
        hq = config.num_attention_heads * d
        hkv = config.num_key_value_heads * d
        qkv = linear(x, lp.wqkv)                 # one fused matmul
        q, k, v = (qkv[..., :hq], qkv[..., hq:hq + hkv],
                   qkv[..., hq + hkv:])
    else:
        q, k, v = linear(x, lp.wq), linear(x, lp.wk), linear(x, lp.wv)
    q = q.reshape(b, s, config.num_attention_heads, d)
    k = k.reshape(b, s, config.num_key_value_heads, d)
    v = v.reshape(b, s, config.num_key_value_heads, d)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    return q, k, v


def post_attention(lp: LayerParams, config: ModelConfig, attn_out: jax.Array,
                   residual: jax.Array) -> jax.Array:
    """o_proj + residual + MLP block (reference `post_attention_compute`,
    `models/llama.py:159-183`). attn_out: [B, S, Hq*d]; residual: [B, S, h]."""
    hidden = residual + linear(attn_out.astype(residual.dtype), lp.wo)
    residual = hidden
    x = rms_norm(hidden, lp.ln_mlp, config.rms_norm_eps)
    if lp.w_gateup is not None:
        inter = lp.w_gateup.scale.shape[-1] // 2 \
            if isinstance(lp.w_gateup, (QuantWeight, Quant4Weight)) \
            else lp.w_gateup.shape[-1] // 2
        gu = linear(x, lp.w_gateup)              # one fused matmul
        g, u = gu[..., :inter], gu[..., inter:]
    else:
        g, u = linear(x, lp.w_gate), linear(x, lp.w_up)
    gate = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
    hidden = linear(gate * u.astype(x.dtype), lp.w_down)
    return residual + hidden


def unembed(params: LlamaParams, config: ModelConfig, hidden: jax.Array):
    """Final norm + LM head on the last position. hidden: [B, h] -> [B, V]."""
    x = rms_norm(hidden, params.final_ln, config.rms_norm_eps)
    return linear(x, params.lm_head).astype(jnp.float32)
