"""W4A8 grouped-int4 weights (`models/llama.py::Quant4Weight`).

The reference ships bf16 weights only; int4 weights are a TPU capacity
lever on top of the W8A8 path (see BENCHMARKS.md capacity table — they are
what fits Llama-3.1-8B @ 96K with the block_topk4 state on one 16 GB
chip). Group-128 scales bound the quantization error per 128-input slab;
the decode path must match the mathematically-expected grouped-dot result
and the prefill (dequantized) path must agree with it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import LSHConfig, preset
from magicpig_tpu.models.llama import (
    W4_GROUP,
    Quant4Weight,
    linear,
    quantize_weight4,
    unpack_weight4,
)


def test_quantize4_roundtrip_bound():
    """Elementwise |w - dequant(w)| <= scale/2 within each group."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 192)) * 0.3, jnp.float32)
    qw = quantize_weight4(w)
    # nibble-packed int8 storage (s4 arrays break at dispatch boundaries
    # on the axon backend; see Quant4Weight docstring)
    assert str(qw.q.dtype) == "int8" and qw.q.shape == (128, 192)
    assert qw.scale.shape == (2, 192)
    q = np.asarray(unpack_weight4(qw.q), np.float32).reshape(
        2, W4_GROUP, 192)
    wde = (q * np.asarray(qw.scale)[:, None, :]).reshape(256, 192)
    err = np.abs(wde - np.asarray(w))
    bound = np.repeat(np.asarray(qw.scale), W4_GROUP, axis=0) * 0.5 + 1e-6
    assert (err <= bound).all(), err.max()


def test_quantize4_stacked_layer_slice():
    """Stacked [N, in, out] weights slice per layer with aligned scales."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 128, 64)), jnp.float32)
    qw = quantize_weight4(w)
    assert qw.q.shape == (3, 64, 64) and qw.scale.shape == (3, 1, 64)
    per = quantize_weight4(w[1])
    np.testing.assert_array_equal(np.asarray(qw.q[1], np.int8),
                                  np.asarray(per.q, np.int8))
    np.testing.assert_allclose(np.asarray(qw.scale[1]),
                               np.asarray(per.scale))


def test_linear4_decode_close_to_exact():
    """Small-M (grouped s8 dot) path: combined W4A8 noise stays small
    relative to the exact f32 product on standard-normal data."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 192)) / 16.0, jnp.float32)
    got = np.asarray(linear(x, quantize_weight4(w)))
    want = np.asarray(x @ w)
    denom = np.abs(want).max()
    # Analytic W4 noise at kin=256 on standard normals: per-weight err std
    # ~ scale/(2*sqrt(3)) accumulates to ~0.12 output RMS -> corr ~0.993
    # and worst element ~0.14 of max. Assert just outside that floor.
    assert np.abs(got - want).max() / denom < 0.2
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.985, corr


def test_linear4_prefill_path_matches_decode_path():
    """The m>=512 dequantized-weight pass and the grouped-dot pass agree
    up to the activation-quantization noise (identical weight error)."""
    rng = np.random.default_rng(3)
    w4 = quantize_weight4(
        jnp.asarray(rng.standard_normal((128, 96)) / 12.0, jnp.float32))
    xs = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    small = np.asarray(linear(xs, w4))                      # grouped dot
    xl = jnp.tile(xs, (200, 1))                             # m = 800
    large = np.asarray(linear(xl, w4))[:4]                  # dequant pass
    denom = np.abs(large).max()
    assert np.abs(small - large).max() / denom < 0.03


def test_engine_w4_needle_retrieval():
    """End-to-end function preservation: the shipped trained checkpoint
    (data/needle_ckpt.npz) quantized to W4 still resolves the 1-needle
    retrieval protocol through prefill + 2 decode steps. (A random-init
    tiny net is the wrong check here — with no trained structure the
    per-matmul int4 noise compounds to ~0.84 logits correlation while
    W8 sits at ~0.99 on the same net; trained weights are what the
    deployment format must preserve.)"""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from train_needle import (
        FILLER_HI,
        FILLER_LO,
        KEY_HI,
        KEY_LO,
        MARK,
        QUERY,
        VAL_HI,
        VAL_LO,
        BOS,
        load_params,
        model_config,
    )

    from magicpig_tpu.models.llama import quantize_params
    from magicpig_tpu.runtime.engine import LLM

    cfg = model_config()
    ckpt = os.path.join(os.path.dirname(__file__), "..", "data",
                        "needle_ckpt.npz")
    params = quantize_params(load_params(ckpt, cfg, 1280), bits=4)
    lsh = LSHConfig(K=0, L=0, num_sink_tokens=4, num_local_tokens=64,
                    generation_buffer=128)
    llm = LLM(cfg, batch_size=1, max_length=1280, chunk_size=1024,
              params=params, lsh=lsh, seed=0)

    rng = np.random.default_rng(9)
    correct = 0
    n = 6
    for _ in range(n):
        ctx = 1024
        toks = rng.integers(FILLER_LO, FILLER_HI, size=ctx)
        toks[0] = BOS
        key = int(rng.integers(KEY_LO, KEY_HI))
        val = int(rng.integers(VAL_LO, VAL_HI))
        pos = int(rng.integers(8, ctx - 300))
        toks[pos:pos + 3] = (MARK, key, val)
        llm.release_slot(0)
        llm.prefill(toks.astype(np.int32), request_id=0)
        llm.inference(np.asarray([QUERY], np.int32))
        logits = llm.inference(np.asarray([key], np.int32))
        correct += int(np.asarray(logits)[0].argmax()) == val
    assert correct >= n - 1, f"W4 retrieval {correct}/{n}"


def test_w4_param_pspecs_consistent():
    """TP pspecs for Quant4Weight leaves: scale group axis shards like the
    input axis it tiles; device_put on a 2x4 mesh must succeed."""
    import dataclasses

    from magicpig_tpu.models.llama import init_params
    from magicpig_tpu.parallel.mesh import make_mesh, param_pspecs

    cfg = dataclasses.replace(
        preset("llama-tiny"), hidden_size=512, intermediate_size=512,
        num_attention_heads=8, num_key_value_heads=4, head_dim=64,
        weight_quant="int4")
    params = init_params(cfg, jax.random.key(0), 256)
    mesh = make_mesh(2, 4)
    specs = param_pspecs(params)
    from jax.sharding import NamedSharding

    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
    lw = sharded.layers
    assert str(lw.wq.q.dtype) == "int8"
    # Row-parallel w_down: in=512 -> 4 groups over 4 model shards.
    assert lw.w_down.scale.shape == (cfg.num_hidden_layers, 4, 512)


def test_w4_matmul_kernel_matches_dequant():
    """Pallas packed-nibble matmul (interpret mode) == x @ dequant(W) for
    every supported block regime: whole-kin (kin//2 <= 1024), blocked kin
    (1024/512 packed-row steps), multi-out-block, and padded M."""
    from magicpig_tpu.ops.pallas.w4_matmul import w4_block_shapes, w4_matmul

    rng = np.random.default_rng(7)
    for m, kin, out in [(1, 512, 384), (3, 2048, 256), (8, 4096, 512),
                        (5, 3072, 128), (2, 128, 128)]:
        w = jnp.asarray(rng.standard_normal((kin, out)) / 8, jnp.float32)
        qw = quantize_weight4(w)
        x = jnp.asarray(rng.standard_normal((m, kin)), jnp.float32)
        assert w4_block_shapes(m, kin, out) is not None, (m, kin, out)
        got = np.asarray(w4_matmul(x.astype(jnp.bfloat16), qw.q, qw.scale,
                                   interpret=True))
        g = kin // W4_GROUP
        wde = (np.asarray(unpack_weight4(qw.q), np.float32).reshape(
            g, W4_GROUP, out) * np.asarray(qw.scale)[:, None, :]).reshape(
            kin, out)
        want = np.asarray(x, np.float32).astype(np.float32) @ wde
        # bf16 activation rounding is the only error source
        denom = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / denom < 5e-2, (m, kin, out)


def test_w4_matmul_kernel_unsupported_shapes():
    from magicpig_tpu.ops.pallas.w4_matmul import w4_block_shapes

    assert w4_block_shapes(128, 512, 512) is None      # m too large
    assert w4_block_shapes(1, 192, 512) is None        # kin not 128-aligned
    assert w4_block_shapes(1, 512, 192) is None        # out not 128-aligned
    assert w4_block_shapes(1, 2816 * 2, 512) is None   # kin//2 % 512 != 0


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_qkv_gateup_matches_unfused(bits):
    """fuse_params (quantize-then-concat) must reproduce the separate
    projections' outputs exactly — same quantized values, same scales,
    per-column-independent math."""
    import dataclasses

    from magicpig_tpu.models.llama import (fuse_params, init_params,
                                           post_attention, qkv_proj,
                                           quantize_params)
    from magicpig_tpu.config import ModelConfig

    cfg = ModelConfig(name="t", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=32, rope_theta=1e4, rope_scaling=None,
                      max_position_embeddings=256, eos_token_ids=(0,),
                      dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(0), 64)
    qp = quantize_params(params, bits=bits)
    fp = fuse_params(qp)
    assert fp.layers.wq is None and fp.layers.w_gate is None
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.float32)
    pos = jnp.zeros((2, 3), jnp.int32)
    for i in range(2):
        q1, k1, v1 = qkv_proj(qp.layers.layer(i), cfg, hidden, pos,
                              params.cos, params.sin)
        q2, k2, v2 = qkv_proj(fp.layers.layer(i), cfg, hidden, pos,
                              params.cos, params.sin)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(k2), np.asarray(k1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=1e-6, atol=1e-6)
        attn = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.float32)
        h1 = post_attention(qp.layers.layer(i), cfg, attn, hidden)
        h2 = post_attention(fp.layers.layer(i), cfg, attn, hidden)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                                   rtol=1e-6, atol=1e-6)

    # init_params builds the fused form directly under the config flag
    cfgf = dataclasses.replace(cfg, weight_quant="int8" if bits == 8
                               else "int4", fuse_small_linears=True)
    pf = init_params(cfgf, jax.random.key(0), 64)
    assert pf.layers.wqkv is not None and pf.layers.wq is None


def test_w4_matmul_unpack8_matches_int32_unpack():
    """int8-native nibble unpack == the int32-widen unpack, bit for bit."""
    from magicpig_tpu.ops.pallas.w4_matmul import w4_matmul

    rng = np.random.default_rng(5)
    m, kin, out = 4, 256, 256
    x = jnp.asarray(rng.standard_normal((m, kin)), jnp.bfloat16)
    q = jnp.asarray(rng.integers(-128, 128, (kin // 2, out), np.int8))
    s = jnp.asarray(rng.uniform(0.001, 0.02, (kin // 128, out)), jnp.float32)
    a = w4_matmul(x, q, s, interpret=True, unpack8=True)
    b = w4_matmul(x, q, s, interpret=True, unpack8=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
