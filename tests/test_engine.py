"""End-to-end engine tests on the tiny model.

The strongest check mirrors the reference's strategy of cross-checking
against HF transformers (`evaluations/RULER/pred/llama_ref.py` is an HF fork
used as the accuracy oracle): the K=0 (full attention) engine must match
HF LlamaForCausalLM logits on the same random weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import LSHConfig, preset
from magicpig_tpu.models.loader import params_from_state_dict
from magicpig_tpu.runtime.engine import LLM

TINY = preset("llama-tiny")
MAX_LEN = 256


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        rms_norm_eps=TINY.rms_norm_eps,
        rope_theta=TINY.rope_theta,
        max_position_embeddings=TINY.max_position_embeddings,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def tiny_params(hf_model):
    cfg = dataclasses.replace(TINY, dtype=jnp.float32)
    return params_from_state_dict(cfg, hf_model.state_dict(), MAX_LEN,
                                  dtype=jnp.float32)


def _fp32_tiny():
    return dataclasses.replace(TINY, dtype=jnp.float32)


def _make_llm(K, L, params, batch_size=1, **kw):
    lsh = LSHConfig(K=K, L=L, num_sink_tokens=4, num_local_tokens=16,
                    generation_buffer=32, **kw)
    return LLM(_fp32_tiny(), batch_size=batch_size, max_length=MAX_LEN,
               chunk_size=32, params=params, lsh=lsh)


def test_full_attention_engine_matches_hf_logits(hf_model, tiny_params):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, TINY.vocab_size, size=100).astype(np.int32)

    llm = _make_llm(K=0, L=0, params=tiny_params)
    logits = np.asarray(llm.prefill(prompt))

    with torch.no_grad():
        hf_out = hf_model(torch.tensor(prompt[None].astype(np.int64))).logits
    hf_last = hf_out[0, -1].numpy()
    np.testing.assert_allclose(logits[0], hf_last, rtol=2e-3, atol=2e-3)

    # Greedy decode 8 steps and compare tokens (the decisive parity check).
    tok = int(logits[0].argmax())
    ours = [tok]
    for _ in range(7):
        logits_step = np.asarray(llm.inference(np.asarray([tok])))
        tok = int(logits_step[0].argmax())
        ours.append(tok)

    with torch.no_grad():
        ids = torch.tensor(prompt[None].astype(np.int64))
        hf_tokens = hf_model.generate(
            ids, max_new_tokens=8, do_sample=False)[0, len(prompt):].tolist()
    assert ours == hf_tokens


def test_lsh_engine_tracks_full_attention(hf_model, tiny_params):
    """Plumbing check with K=1, L=32: every key collides in >=2 tables with
    prob ~0.9998 and the debias weight is ~1, so the LSH engine must track
    the K=0 engine tightly through decode — this exercises centering, norms,
    codes, masking and the LSE merge end-to-end. (Statistical quality of
    real sparse sampling is covered by the concentrated-key test in
    test_attention_ops.py; a random-weight tiny model has diffuse attention
    where top-1 agreement is meaningless.)"""
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)

    full = _make_llm(K=0, L=0, params=tiny_params)
    lsh = _make_llm(K=1, L=32, params=tiny_params)

    lf = np.asarray(full.prefill(prompt))
    ls = np.asarray(lsh.prefill(prompt))
    # Prefill is exact in both engines (full attention during prefill).
    np.testing.assert_allclose(ls, lf, rtol=1e-3, atol=1e-3)

    tok = int(lf[0].argmax())
    for _ in range(4):
        lf = np.asarray(full.inference(np.asarray([tok])))
        ls = np.asarray(lsh.inference(np.asarray([tok])))
        err = np.abs(ls - lf).max() / max(np.abs(lf).max(), 1e-6)
        assert err < 0.05, f"K=1/L=32 decode logits diverge: {err}"
        assert int(lf[0].argmax()) == int(ls[0].argmax())
        tok = int(lf[0].argmax())
    assert lsh.avg_sparsity > 0.9  # nearly everything sampled at K=1/L=32

    # Real sparse setting runs and is actually sparse.
    sparse = _make_llm(K=6, L=40, params=tiny_params)
    sparse.prefill(prompt)
    out = np.asarray(sparse.inference(np.asarray([tok])))
    assert np.isfinite(out).all()
    assert 0 < sparse.avg_sparsity < 0.6


def test_batched_decode_two_requests(tiny_params):
    """Reference batch flow: sequential prefills into slots, batched decode
    (`examples/batch_generation.py:43-59`)."""
    rng = np.random.default_rng(2)
    p0 = rng.integers(1, TINY.vocab_size, size=64).astype(np.int32)
    p1 = rng.integers(1, TINY.vocab_size, size=96).astype(np.int32)

    llm = _make_llm(K=6, L=40, params=tiny_params, )
    single = _make_llm(K=6, L=40, params=tiny_params)
    batched = LLM(_fp32_tiny(), batch_size=2, max_length=MAX_LEN,
                  chunk_size=32, params=tiny_params,
                  lsh=LSHConfig(K=6, L=40, num_sink_tokens=4,
                                num_local_tokens=16, generation_buffer=32))
    l0 = batched.prefill(p0, request_id=0)
    l1 = batched.prefill(p1, request_id=1)

    s0 = np.asarray(single.prefill(p0))
    np.testing.assert_allclose(np.asarray(l0)[0], s0[0], rtol=1e-3, atol=1e-3)

    toks = np.asarray([int(np.asarray(l0)[0].argmax()),
                       int(np.asarray(l1)[0].argmax())], np.int32)
    step = batched.inference(toks)
    ss = np.asarray(single.inference(toks[:1]))
    np.testing.assert_allclose(np.asarray(step)[0], ss[0], rtol=1.5e-3,
                               atol=1.5e-3)


def test_generate_runs_and_clears(tiny_params):
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, TINY.vocab_size, size=80).astype(np.int32)
    llm = _make_llm(K=6, L=40, params=tiny_params)
    out = llm.generate(prompt, max_tokens=5, temperature=0.0)
    assert 1 <= len(out) <= 5
    assert all(isinstance(t, int) for t in out)
    assert int(np.asarray(llm.state.pos)[0]) == 0  # cleared


@pytest.mark.parametrize("estimator,kw,tol", [
    # At budget 1.0 TopK degenerates to exact full attention over the
    # offload region; Quest selects every page. Both must match K=0.
    ("topk", {"topk_budget_frac": 1.0}, 2e-3),
    ("quest", {"quest_budget_frac": 1.0, "quest_page_size": 16}, 2e-3),
    ("block_topk", {"block_topk_budget_frac": 1.0,
                    "block_topk_block_size": 16}, 2e-3),
    # OracleSampling at a huge sample count converges statistically.
    ("oracle_sampling", {"os_budget_frac": 8.0}, 0.15),
])
def test_baseline_estimators_track_full_attention(tiny_params, estimator,
                                                  kw, tol):
    """Engine-level parity: each baseline server at full budget must
    reproduce the K=0 full-attention engine (reference cross-check pattern:
    the baselines share the eval harness with exact attention,
    `model_wrappers.py:25-32`)."""
    rng = np.random.default_rng(7)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)

    full = _make_llm(K=0, L=0, params=tiny_params)
    base = _make_llm(K=10, L=0, params=tiny_params, estimator=estimator,
                     dense_layers=(0,), **kw)

    lf = np.asarray(full.prefill(prompt))
    lb = np.asarray(base.prefill(prompt))
    np.testing.assert_allclose(lb, lf, rtol=1e-3, atol=1e-3)

    tok = int(lf[0].argmax())
    for _ in range(3):
        lf = np.asarray(full.inference(np.asarray([tok])))
        lb = np.asarray(base.inference(np.asarray([tok])))
        err = np.abs(lb - lf).max() / max(np.abs(lf).max(), 1e-6)
        assert err < tol, f"{estimator}: decode logits diverge: {err}"
        tok = int(lf[0].argmax())


@pytest.mark.parametrize("estimator", ["quest", "topk", "oracle_sampling",
                                       "block_topk"])
def test_baseline_estimators_run_sparse(tiny_params, estimator):
    """Sparse budgets produce finite logits and a sane workload metric."""
    rng = np.random.default_rng(8)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)
    llm = _make_llm(K=10, L=0, params=tiny_params, estimator=estimator,
                    quest_budget_frac=0.25, topk_budget_frac=0.25,
                    os_budget_frac=0.25, block_topk_block_size=16,
                    block_topk_budget_frac=0.25)
    llm.prefill(prompt)
    out = np.asarray(llm.inference(np.asarray([3])))
    assert np.isfinite(out).all()
    assert 0 < llm.avg_sparsity <= 1.5


def test_negative_k_selects_quest():
    """Reference K-sign server selection (`llama_dist.py:122-133`)."""
    llm = LLM(_fp32_tiny(), K=-10, batch_size=1, max_length=MAX_LEN,
              chunk_size=32)
    assert llm.lsh.estimator == "quest"
    assert llm.lsh.K == 10


@pytest.mark.parametrize("estimator", ["block_topk", "lsh", "topk"])
def test_int8_offload_tracks_bf16(tiny_params, estimator):
    """int8 offload KV must track the exact engine closely (per-row
    symmetric quantization keeps ~0.4% relative error on scores)."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)

    # For lsh use K=1/L=32 (samples ~everything, debias ~1) so the int8-vs-
    # bf16 delta is pure quantization, not a different random sampled set.
    kw = dict(estimator=estimator, block_topk_block_size=16,
              block_topk_budget_frac=1.0, topk_budget_frac=1.0,
              K=1 if estimator == "lsh" else 10,
              L=32 if estimator == "lsh" else 0)
    exact = _make_llm(params=tiny_params, **kw)
    quant = _make_llm(params=tiny_params, offload_quant="int8", **kw)

    le = np.asarray(exact.prefill(prompt))
    lq = np.asarray(quant.prefill(prompt))
    np.testing.assert_allclose(lq, le, rtol=1e-3, atol=1e-3)  # prefill exact

    tok = int(le[0].argmax())
    for _ in range(3):
        le = np.asarray(exact.inference(np.asarray([tok])))
        lq = np.asarray(quant.inference(np.asarray([tok])))
        err = np.abs(lq - le).max() / max(np.abs(le).max(), 1e-6)
        assert err < 0.1, f"{estimator} int8 drift: {err}"
        tok = int(le[0].argmax())


@pytest.mark.parametrize("estimator", ["block_topk", "lsh"])
def test_int4_offload_tracks_bf16(tiny_params, estimator):
    """int4-K offload (V stays int8) runs the same paths as int8 and stays
    within the coarser grid's drift bound on decode logits."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)

    kw = dict(estimator=estimator, block_topk_block_size=16,
              block_topk_budget_frac=1.0, topk_budget_frac=1.0,
              K=1 if estimator == "lsh" else 10,
              L=32 if estimator == "lsh" else 0)
    exact = _make_llm(params=tiny_params, **kw)
    quant = _make_llm(params=tiny_params, offload_quant="int4", **kw)

    le = np.asarray(exact.prefill(prompt))
    lq = np.asarray(quant.prefill(prompt))
    np.testing.assert_allclose(lq, le, rtol=1e-3, atol=1e-3)  # prefill exact

    tok = int(le[0].argmax())
    for _ in range(3):
        le = np.asarray(exact.inference(np.asarray([tok])))
        lq = np.asarray(quant.inference(np.asarray([tok])))
        err = np.abs(lq - le).max() / max(np.abs(le).max(), 1e-6)
        assert err < 0.25, f"{estimator} int4 drift: {err}"
        tok = int(le[0].argmax())


def test_dense_int8_kv_tracks_exact(tiny_params):
    """dense_quant="int8" (full-attention K=0 engine: every layer dense)
    stays within the per-row int8 grid's drift bound on decode logits,
    through both prefill fill and the decode append path."""
    rng = np.random.default_rng(12)
    prompt = rng.integers(1, TINY.vocab_size, size=120).astype(np.int32)

    exact = _make_llm(K=0, L=0, params=tiny_params)
    quant = _make_llm(K=0, L=0, params=tiny_params, dense_quant="int8")

    le = np.asarray(exact.prefill(prompt))
    lq = np.asarray(quant.prefill(prompt))
    err = np.abs(lq - le).max() / max(np.abs(le).max(), 1e-6)
    assert err < 0.05, f"dense int8 prefill drift: {err}"

    tok = int(le[0].argmax())
    for _ in range(4):
        le = np.asarray(exact.inference(np.asarray([tok])))
        lq = np.asarray(quant.inference(np.asarray([tok])))
        err = np.abs(lq - le).max() / max(np.abs(le).max(), 1e-6)
        assert err < 0.08, f"dense int8 decode drift: {err}"
        tok = int(le[0].argmax())

    # Sparse engine with a quantized dense layer 0 alongside int8 offload.
    kw = dict(estimator="block_topk", block_topk_block_size=16,
              block_topk_budget_frac=1.0, K=1, L=0)
    sp = _make_llm(params=tiny_params, offload_quant="int8",
                   dense_quant="int8", **kw)
    sp_ref = _make_llm(params=tiny_params, offload_quant="int8", **kw)
    ls = np.asarray(sp.prefill(prompt))
    lr = np.asarray(sp_ref.prefill(prompt))
    err = np.abs(ls - lr).max() / max(np.abs(lr).max(), 1e-6)
    assert err < 0.08, f"sparse dense-int8 drift: {err}"


def test_continuous_batching_scheduler(tiny_params):
    """Continuous batching: 4 requests over 2 slots; each result must match
    a dedicated single-request engine (greedy)."""
    from magicpig_tpu.runtime.serving import Scheduler

    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, TINY.vocab_size, size=n).astype(np.int32)
               for n in (60, 72, 66, 80)]

    llm = LLM(_fp32_tiny(), batch_size=2, max_length=MAX_LEN, chunk_size=32,
              params=tiny_params,
              lsh=LSHConfig(K=6, L=40, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    sched = Scheduler(llm)
    for p in prompts:
        sched.submit(p, max_tokens=4)
    finished = sched.run()
    assert len(finished) == 4
    by_uid = {r.uid: r for r in finished}

    for uid, p in zip(sorted(by_uid), prompts):
        single = _make_llm(K=6, L=40, params=tiny_params)
        logits = single.prefill(p)
        want = [int(np.asarray(logits)[0].argmax())]
        for _ in range(3):
            logits = single.inference(np.asarray([want[-1]]))
            want.append(int(np.asarray(logits)[0].argmax()))
        assert by_uid[uid].generated[:4] == want, uid


def test_chunked_prefill_matches_monolithic(tiny_params):
    """`start_prefill` (staged, one chunk per dispatch — the interleaved
    admission path) must produce the same first-token logits and the same
    subsequent decode as the monolithic `prefill`."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, TINY.vocab_size, size=77).astype(np.int32)

    mono = _make_llm(K=6, L=40, params=tiny_params)
    l_mono = np.asarray(mono.prefill(prompt))

    chunked = _make_llm(K=6, L=40, params=tiny_params)
    cp = chunked.start_prefill(prompt, request_id=0)
    assert cp.n_chunks == 3                      # 77 tokens / chunk_size 32
    steps = 0
    logits = None
    while not cp.done:
        logits = cp.step()
        steps += 1
    assert steps == cp.n_chunks
    np.testing.assert_allclose(np.asarray(logits), l_mono,
                               rtol=1e-5, atol=1e-5)

    tok_m = int(l_mono[0].argmax())
    tok_c = int(np.asarray(logits)[0].argmax())
    for _ in range(4):
        lm = np.asarray(mono.inference(np.asarray([tok_m])))
        lc = np.asarray(chunked.inference(np.asarray([tok_c])))
        np.testing.assert_allclose(lc, lm, rtol=1e-5, atol=1e-5)
        tok_m, tok_c = int(lm[0].argmax()), int(lc[0].argmax())
        assert tok_m == tok_c


def test_interleaved_scheduler_matches_synchronous(tiny_params):
    """Scheduler(interleave=True) — prefill chunks interleaved with live
    decodes — must produce exactly the synchronous scheduler's outputs."""
    from magicpig_tpu.runtime.serving import Scheduler

    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, TINY.vocab_size, size=n).astype(np.int32)
               for n in (70, 64, 90, 62)]

    results = {}
    for interleave in (False, True):
        llm = LLM(_fp32_tiny(), batch_size=2, max_length=MAX_LEN,
                  chunk_size=32, params=tiny_params,
                  lsh=LSHConfig(K=6, L=40, num_sink_tokens=4,
                                num_local_tokens=16, generation_buffer=32))
        sched = Scheduler(llm, interleave=interleave)
        for p in prompts:
            sched.submit(p, max_tokens=5)
        finished = sched.run()
        assert len(finished) == 4
        results[interleave] = {r.uid: r.generated for r in finished}

    assert results[True] == results[False]


def test_generation_buffer_guard(tiny_params):
    """Decoding past the hot-buffer capacity must fail loudly instead of
    silently clamping the cache append (reference sizes its paged cache for
    M + generation_buffer, `models/attnserver.py:16,25`)."""
    from magicpig_tpu.runtime.state import hot_capacity

    rng = np.random.default_rng(5)
    prompt = rng.integers(1, TINY.vocab_size, size=60).astype(np.int32)
    llm = _make_llm(K=4, L=8, params=tiny_params)
    cap = hot_capacity(llm.lsh)
    budget = cap - llm.lsh.num_sink_tokens - llm.lsh.num_local_tokens

    with pytest.raises(ValueError, match="generation buffer"):
        llm.generate(prompt, max_tokens=budget + 1, temperature=0.0)

    # Stepwise decode trips the same guard exactly at capacity.
    llm.clear()
    llm.prefill(prompt, request_id=0)
    llm.decode_steps(np.zeros((1,), np.int32), budget)
    with pytest.raises(ValueError, match="generation-buffer"):
        llm.inference(np.zeros((1,), np.int32))

    # release_slot frees the mirror so the slot is reusable.
    llm.release_slot(0)
    llm.prefill(prompt, request_id=0)
    llm.inference(np.zeros((1,), np.int32))


def test_per_task_sparsity_snapshot(tiny_params):
    """avg_sparsity_since reports only the steps after the snapshot."""
    rng = np.random.default_rng(6)
    prompt = rng.integers(1, TINY.vocab_size, size=60).astype(np.int32)
    llm = _make_llm(K=4, L=8, params=tiny_params)
    llm.prefill(prompt, request_id=0)
    llm.decode_steps(np.zeros((1,), np.int32), 4)
    snap = llm.sparsity_snapshot()
    llm.decode_steps(np.zeros((1,), np.int32), 4)
    since = llm.avg_sparsity_since(snap)
    assert 0.0 <= since <= 1.0
    assert llm._sparsity_steps == 8


def test_int8_weights_track_bf16(tiny_params):
    """W8A8 weights (QuantWeight, models/llama.py): logits stay close to
    the exact-weight engine and greedy decode still works. Per-channel
    weight + dynamic per-token activation quantization bounds the error."""
    import dataclasses as dc

    from magicpig_tpu.models.llama import QuantWeight, quantize_params

    rng = np.random.default_rng(9)
    prompt = rng.integers(1, TINY.vocab_size, size=80).astype(np.int32)

    exact = _make_llm(K=0, L=0, params=tiny_params)
    ref = np.asarray(exact.prefill(prompt))

    qparams = quantize_params(tiny_params)
    assert isinstance(qparams.layers.wq, QuantWeight)
    llm = LLM(_fp32_tiny(), batch_size=1, max_length=MAX_LEN, chunk_size=32,
              params=qparams,
              lsh=LSHConfig(K=0, L=0, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    got = np.asarray(llm.prefill(prompt))
    # Quantization noise scales with logit magnitude; demand close logits
    # and an unchanged top-1 (the decisive bit for greedy decode).
    assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1) < 0.05
    assert got[0].argmax() == ref[0].argmax()
    out = np.asarray(llm.inference(np.asarray([got[0].argmax()])))
    assert np.isfinite(out).all()


def test_int8_weights_sharded(tiny_params):
    """QuantWeight param pspecs shard q on the weight layout and scales on
    the output channel (parallel/mesh.py:_wspec)."""
    from magicpig_tpu.models.llama import quantize_params
    from magicpig_tpu.parallel.mesh import make_mesh, shard_engine

    qparams = quantize_params(tiny_params)
    llm = LLM(_fp32_tiny(), batch_size=2, max_length=MAX_LEN, chunk_size=32,
              params=qparams,
              lsh=LSHConfig(K=4, L=8, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    mesh = make_mesh(2, 2)
    shard_engine(llm, mesh)
    rng = np.random.default_rng(10)
    with mesh:
        for r in range(2):
            prompt = rng.integers(1, TINY.vocab_size, size=60).astype(np.int32)
            llm.prefill(prompt, request_id=r)
        out = np.asarray(llm.inference(np.zeros((2,), np.int32)))
    assert np.isfinite(out).all()
