#!/usr/bin/env python
"""Measured 8B W4 decode profile (VERDICT r4 item 5) + fused-shape rows
(item 6: the rows `verify_w4_tpu.py` lost to the HTTP-413 crash).

Times, on the real chip, every stage of the Llama-3.1-8B @ 96K B=1 decode
step the bench runs (results/hw_r4/bench_8b.json: 36.3 tok/s = 27.6 ms):

  A. each W4 linear at its model shape via the SAME `linear()` dispatch
     the model uses (Pallas w4_matmul for small out, chunked XLA for
     lm_head) — separate q/k/v and gate/up calls AND their fused
     concatenated-out equivalents (one call, identical math);
  B. a full layer's weight chain (7 calls) vs the fused chain (4 calls);
  C. dense flash_decode and the block_topk scorer+attend at 96K;
  D. the per-token glue (RMSNorm, RoPE, sampling) at decode shapes.

Every timing runs inside a lax.scan whose per-step input varies (hoisting
fakes floors — see axon-tpu-measurement-pitfalls); big arrays are jit
args, not closures (HTTP-413). Sections are individually try/except'd so
one failure cannot leave the log ending in a traceback; the script always
prints DONE.
"""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".cache",
                               "jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from magicpig_tpu.models.llama import Quant4Weight, linear  # noqa: E402

H, HQ_D, HKV_D, INTER, VOCAB = 4096, 4096, 1024, 14336, 128256
STEPS = 64


def section(name):
    def deco(fn):
        def run():
            try:
                fn()
            except Exception:
                print(f"[{name}] FAILED:", flush=True)
                traceback.print_exc()
        run.__name__ = name
        return run
    return deco


def make_w4(rng, kin, out):
    q = jnp.asarray(rng.integers(-120, 120, (kin // 2, out), np.int8))
    s = jnp.asarray(rng.uniform(0.001, 0.02, (kin // 128, out)), jnp.float32)
    return Quant4Weight(q=q, scale=s)


def timeit(label, fn, *args, steps=STEPS):
    """fn(x_step, *args) inside lax.scan; x varies per step."""
    @jax.jit
    def loop(xs, *a):
        def body(c, x):
            y = fn(x, *a)
            return c + jnp.sum(y.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return out
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((steps,) + args_shape), jnp.bfloat16)
    loop(xs, *args).block_until_ready()          # compile + warm
    t0 = time.perf_counter()
    loop(xs, *args).block_until_ready()
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"  {label:<44s} {dt:8.3f} ms/step", flush=True)
    return dt


rng = np.random.default_rng(7)
print(jax.devices(), flush=True)

weights = {}
for name, kin, out in [("wq", H, HQ_D), ("wk", H, HKV_D), ("wv", H, HKV_D),
                       ("wqkv", H, HQ_D + 2 * HKV_D), ("wo", HQ_D, H),
                       ("w_gate", H, INTER), ("w_up", H, INTER),
                       ("w_gateup", H, 2 * INTER), ("w_down", INTER, H),
                       ("lm_head", H, VOCAB)]:
    weights[name] = (make_w4(rng, kin, out), kin, out)

results = {}


@section("A_linears")
def a():
    global args_shape
    print("A. per-linear W4 times (model dispatch path), M=1:", flush=True)
    for name, (w, kin, out) in weights.items():
        args_shape = (1, kin)
        results[name] = timeit(f"{name} [{kin}->{out}]",
                               lambda x, w=w: linear(x, w))


@section("A2_unpack8")
def a2():
    global args_shape
    print("A2. w4_matmul nibble-unpack variants (gate shape):", flush=True)
    from magicpig_tpu.ops.pallas.w4_matmul import w4_matmul
    w, kin, out = weights["w_gate"][0], H, INTER
    args_shape = (1, kin)
    # unpack8=True is not lowerable on this target (no vector<i8> shli);
    # only the int32-widen path is timed.
    results["unpack32_gate"] = timeit(
        f"w4_matmul gate [{kin}->{out}] (int32 unpack)",
        lambda x: w4_matmul(x, w.q, w.scale))
    w2, kin2, out2 = weights["w_gateup"][0], H, 2 * INTER
    results["unpack32_gateup"] = timeit(
        f"w4_matmul gate|up [{kin2}->{out2}] (int32 unpack)",
        lambda x: w4_matmul(x, w2.q, w2.scale))


@section("B_layer_chain")
def bsec():
    global args_shape
    print("B. one full layer's weight chain, M=1:", flush=True)
    wq, wk, wv = (weights[n][0] for n in ("wq", "wk", "wv"))
    wqkv = weights["wqkv"][0]
    wo = weights["wo"][0]
    wg, wu, wgu = (weights[n][0] for n in ("w_gate", "w_up", "w_gateup"))
    wd = weights["w_down"][0]

    def chain7(x):
        q = linear(x, wq)
        k = linear(x, wk)
        v = linear(x, wv)
        h = linear(q, wo) + jnp.sum(k) + jnp.sum(v)
        g = linear(h, wg)
        u = linear(h, wu)
        return linear(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                      wd)

    def chain4(x):
        qkv = linear(x, wqkv)
        q = qkv[:, :HQ_D]
        h = linear(q, wo) + jnp.sum(qkv[:, HQ_D:])
        gu = linear(h, wgu)
        g, u = gu[:, :INTER], gu[:, INTER:]
        return linear(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                      wd)

    args_shape = (1, H)
    results["chain7"] = timeit("layer chain: 7 separate calls", chain7)
    results["chain4"] = timeit("layer chain: fused qkv+gateup (4 calls)",
                               chain4)
    print(f"  => per-layer saving {results['chain7'] - results['chain4']:.3f}"
          f" ms x 32 layers = "
          f"{(results['chain7'] - results['chain4']) * 32:.2f} ms/step",
          flush=True)


@section("C_attention")
def csec():
    global args_shape
    # Time the PRODUCTION per-layer decode fns against a synthetic state
    # at the bench's 8B flagship geometry (d=128, Hkv=8, 96K, int8 dense
    # KV + int4-packed block_topk offload), so glue is included.
    print("C. per-layer decode at 96K (production server fns):", flush=True)
    from magicpig_tpu.config import LSHConfig, ModelConfig
    from magicpig_tpu.runtime.state import init_state
    from magicpig_tpu.runtime import server as S

    B, HKV, G, D = 1, 8, 4, 128
    MAXLEN = 98304 + 256
    cfg = ModelConfig(name="p8b", vocab_size=1024, hidden_size=H,
                      intermediate_size=INTER, num_hidden_layers=2,
                      num_attention_heads=HKV * G,
                      num_key_value_heads=HKV, head_dim=D,
                      rope_theta=5e5, rope_scaling=None,
                      max_position_embeddings=MAXLEN, eos_token_ids=(0,),
                      dtype=jnp.bfloat16)
    lsh = LSHConfig(K=1, L=0, estimator="block_topk",
                    block_topk_block_size=512, block_topk_budget_frac=0.08,
                    offload_quant="int4", dense_quant="int8",
                    dense_layers=(0,), generation_buffer=128)
    state = init_state(cfg, lsh, B, MAXLEN)
    r2 = np.random.default_rng(1)

    def fill_like(t):
        return tuple(
            jnp.asarray(r2.integers(-100, 100, leaf.shape).astype(
                np.float32), leaf.dtype) if leaf.dtype != jnp.int8
            else jnp.asarray(r2.integers(-100, 100, leaf.shape, np.int8))
            for leaf in t)

    state = state.replace(
        dense_k=fill_like(state.dense_k), dense_v=fill_like(state.dense_v),
        dense_k_scale=tuple(jnp.abs(x) * 1e-4 + 1e-4
                            for x in fill_like(state.dense_k_scale)),
        dense_v_scale=tuple(jnp.abs(x) * 1e-4 + 1e-4
                            for x in fill_like(state.dense_v_scale)),
        off_k=fill_like(state.off_k), off_v=fill_like(state.off_v),
        off_k_scale=tuple(jnp.abs(x) * 1e-4 + 1e-4
                          for x in fill_like(state.off_k_scale)),
        off_v_scale=tuple(jnp.abs(x) * 1e-4 + 1e-4
                          for x in fill_like(state.off_v_scale)),
        hot_k=fill_like(state.hot_k), hot_v=fill_like(state.hot_v),
        dense_len=jnp.full((B,), MAXLEN - 256, jnp.int32),
        hot_len=jnp.full((B,), 68, jnp.int32),
        off_len=jnp.full((B,), MAXLEN - 4096, jnp.int32),
        pos=jnp.full((B,), MAXLEN - 256, jnp.int32))
    proj = jnp.zeros((D, 1), jnp.float32)
    kn = jnp.zeros((B, HKV, D), jnp.bfloat16)

    args_shape = (B, HKV * G, D)

    def dense_step(q, st):
        return S.decode_dense_layer(st, 0, q, kn, kn)[0]

    def sparse_step(q, st):
        out, _, _ = S.decode_sparse_layer(st, 0, q, kn, kn, proj, lsh)
        return out

    try:
        results["dense_layer_96k"] = timeit(
            "dense layer decode (int8 flash_decode @96K)", dense_step, state)
    except Exception:
        traceback.print_exc()
    results["sparse_layer_96k"] = timeit(
        "block_topk4 sparse layer decode @96K", sparse_step, state)


@section("E_lsh_layer")
def esec():
    global args_shape
    # The fused scan+attend kernel at the 1B lsh bench geometry (d=64,
    # Hkv=8, G=4, K10/L150, int8 offload @96K): round-4's two-stage path
    # measured ~1.4 ms/layer (scan 0.83 + attend + glue); target is the
    # one-stream floor ~(147+105) MB / 310 GB/s ~ 0.8 ms.
    print("E. lsh sparse layer decode @96K (fused scan+attend):", flush=True)
    from magicpig_tpu.config import LSHConfig, ModelConfig
    from magicpig_tpu.runtime.state import init_state
    from magicpig_tpu.runtime import server as S

    HKV, G, D, K, L = 8, 4, 64, 10, 150
    MAXLEN = 98304 + 256
    cfg = ModelConfig(name="p1b", vocab_size=1024, hidden_size=2048,
                      intermediate_size=8192, num_hidden_layers=2,
                      num_attention_heads=HKV * G,
                      num_key_value_heads=HKV, head_dim=D,
                      rope_theta=5e5, rope_scaling=None,
                      max_position_embeddings=MAXLEN, eos_token_ids=(0,),
                      dtype=jnp.bfloat16)
    lsh = LSHConfig(K=K, L=L, estimator="lsh", decode_mode="masked",
                    offload_quant="int8", dense_layers=(0,),
                    generation_buffer=128)
    r2 = np.random.default_rng(2)
    for B in (1, 2):
        state = init_state(cfg, lsh, B, MAXLEN)

        def fill_like(t):
            return tuple(
                jnp.asarray(r2.integers(-100, 100, leaf.shape, np.int8))
                if leaf.dtype == jnp.int8 else
                jnp.asarray(r2.integers(-2**31, 2**31 - 1, leaf.shape)
                            .astype(np.int32), leaf.dtype)
                if leaf.dtype == jnp.int32 else
                jnp.asarray(np.abs(r2.standard_normal(leaf.shape)) * 0.01
                            + 0.001, leaf.dtype)
                for leaf in t)

        state = state.replace(
            off_k=fill_like(state.off_k), off_v=fill_like(state.off_v),
            off_k_scale=fill_like(state.off_k_scale),
            off_v_scale=fill_like(state.off_v_scale),
            hot_k=fill_like(state.hot_k), hot_v=fill_like(state.hot_v),
            k_norm=fill_like(state.k_norm), avg_k=fill_like(state.avg_k),
            planes=fill_like(state.planes),
            hot_len=jnp.full((B,), 68, jnp.int32),
            off_len=jnp.full((B,), state.off_k[0].shape[2] * 2 - 128,
                             jnp.int32),
            pos=jnp.full((B,), MAXLEN - 256, jnp.int32))
        proj = jnp.asarray(r2.standard_normal((D, K * L)), jnp.float32)
        kn = jnp.zeros((B, HKV, D), jnp.bfloat16)
        args_shape = (B, HKV * G, D)
        results[f"lsh_layer_96k_B{B}"] = timeit(
            f"lsh K10L150 sparse layer decode @96K B={B}",
            lambda q, st: S.decode_sparse_layer(st, 0, q, kn, kn, proj,
                                                lsh)[0], state, steps=32)


@section("D_glue")
def dsec():
    global args_shape
    print("D. per-step glue at decode shapes:", flush=True)
    from magicpig_tpu.ops.norms import rms_norm
    g = jnp.ones((H,), jnp.bfloat16)
    args_shape = (1, H)
    results["rms_norm"] = timeit("rms_norm [1,4096] x64",
                                 lambda x: rms_norm(x, g, 1e-5))


for fn in (a, a2, bsec, csec, dsec, esec):
    fn()

if results:
    wsum = sum(results.get(n, 0) for n in
               ("wqkv", "wo", "w_gateup", "w_down"))
    print(f"\nfused per-layer weight time ~{wsum:.3f} ms x32 = "
          f"{wsum * 32:.2f} ms; + lm_head {results.get('lm_head', 0):.2f} ms",
          flush=True)
print("DONE", flush=True)
