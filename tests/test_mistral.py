"""Mistral-family support: loader + engine logits vs HF MistralForCausalLM.

The reference supports Mistral via a second HF fork (`mistral_ref.py`,
SURVEY P11); here the same functional runtime serves both families — the
loader maps identical parameter names and the config carries the rope/eos
differences.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import LSHConfig, ModelConfig
from magicpig_tpu.models.loader import params_from_state_dict
from magicpig_tpu.runtime.engine import LLM

TINY_MISTRAL = ModelConfig(
    name="mistral-tiny",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=3,
    num_attention_heads=8,
    num_key_value_heads=2,
    head_dim=16,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    rope_scaling=None,
    max_position_embeddings=4096,
    eos_token_ids=(2,),
    dtype=jnp.float32,
)


def test_mistral_engine_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig as HFConfig
    from transformers import MistralForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY_MISTRAL.vocab_size,
        hidden_size=TINY_MISTRAL.hidden_size,
        intermediate_size=TINY_MISTRAL.intermediate_size,
        num_hidden_layers=TINY_MISTRAL.num_hidden_layers,
        num_attention_heads=TINY_MISTRAL.num_attention_heads,
        num_key_value_heads=TINY_MISTRAL.num_key_value_heads,
        head_dim=TINY_MISTRAL.head_dim,
        rms_norm_eps=TINY_MISTRAL.rms_norm_eps,
        rope_theta=TINY_MISTRAL.rope_theta,
        max_position_embeddings=TINY_MISTRAL.max_position_embeddings,
        sliding_window=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = MistralForCausalLM(hf_cfg).eval()
    params = params_from_state_dict(TINY_MISTRAL, hf.state_dict(), 256,
                                    dtype=jnp.float32)

    rng = np.random.default_rng(5)
    prompt = rng.integers(3, TINY_MISTRAL.vocab_size, size=90).astype(np.int32)

    llm = LLM(TINY_MISTRAL, batch_size=1, max_length=256, chunk_size=32,
              params=params,
              lsh=LSHConfig(K=0, L=0, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    logits = np.asarray(llm.prefill(prompt))
    with torch.no_grad():
        hf_last = hf(torch.tensor(prompt[None].astype(np.int64)))
    np.testing.assert_allclose(logits[0], hf_last.logits[0, -1].numpy(),
                               rtol=2e-3, atol=2e-3)

    # LSH mode runs on Mistral shapes too.
    lsh = LLM(TINY_MISTRAL, batch_size=1, max_length=256, chunk_size=32,
              params=params,
              lsh=LSHConfig(K=6, L=40, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    lsh.prefill(prompt)
    out = np.asarray(lsh.inference(np.asarray([5])))
    assert np.isfinite(out).all()


def _hf_mistral(sliding_window):
    torch = __import__("torch")
    from transformers import MistralConfig as HFConfig
    from transformers import MistralForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY_MISTRAL.vocab_size,
        hidden_size=TINY_MISTRAL.hidden_size,
        intermediate_size=TINY_MISTRAL.intermediate_size,
        num_hidden_layers=TINY_MISTRAL.num_hidden_layers,
        num_attention_heads=TINY_MISTRAL.num_attention_heads,
        num_key_value_heads=TINY_MISTRAL.num_key_value_heads,
        head_dim=TINY_MISTRAL.head_dim,
        rms_norm_eps=TINY_MISTRAL.rms_norm_eps,
        rope_theta=TINY_MISTRAL.rope_theta,
        max_position_embeddings=TINY_MISTRAL.max_position_embeddings,
        sliding_window=sliding_window,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    return MistralForCausalLM(hf_cfg).eval()


def test_mistral_sliding_window_matches_hf():
    """K=0 engine with sliding_window set must match HF (which masks keys
    older than the window) on prefill AND decode logits — the window is
    active because window < prompt length (`mistral_ref.py:305`)."""
    torch = pytest.importorskip("torch")
    window = 48
    hf = _hf_mistral(window)
    cfg = dataclasses.replace(TINY_MISTRAL, sliding_window=window)
    params = params_from_state_dict(cfg, hf.state_dict(), 256,
                                    dtype=jnp.float32)

    rng = np.random.default_rng(7)
    prompt = rng.integers(3, cfg.vocab_size, size=90).astype(np.int32)

    llm = LLM(cfg, batch_size=1, max_length=256, chunk_size=32,
              params=params,
              lsh=LSHConfig(K=0, L=0, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    logits = np.asarray(llm.prefill(prompt))
    with torch.no_grad():
        hf_out = hf(torch.tensor(prompt[None].astype(np.int64)))
    np.testing.assert_allclose(logits[0], hf_out.logits[0, -1].numpy(),
                               rtol=2e-3, atol=2e-3)

    # Greedy decode parity for 3 steps (HF re-forwarded from scratch so its
    # sliding-window mask is exact at every length).
    ids = list(prompt)
    tok = int(logits[0].argmax())
    for _ in range(3):
        ids.append(tok)
        ours = np.asarray(llm.inference(np.asarray([tok])))[0]
        with torch.no_grad():
            ref = hf(torch.tensor(np.asarray(ids)[None].astype(np.int64)))
        ref_logits = ref.logits[0, -1].numpy()
        np.testing.assert_allclose(ours, ref_logits, rtol=2e-3, atol=2e-3)
        assert ours.argmax() == ref_logits.argmax()
        tok = int(ours.argmax())


def test_mistral_sliding_window_sparse_runs():
    """LSH estimator with a sliding window: offload is window-clipped at
    fill (off_len <= window - local) and decode stays finite."""
    torch = pytest.importorskip("torch")
    window = 144  # > hot capacity (128), < prompt so the clip is active
    hf = _hf_mistral(None)
    cfg = dataclasses.replace(TINY_MISTRAL, sliding_window=window)
    params = params_from_state_dict(cfg, hf.state_dict(), 256,
                                    dtype=jnp.float32)
    rng = np.random.default_rng(8)
    prompt = rng.integers(3, cfg.vocab_size, size=220).astype(np.int32)

    llm = LLM(cfg, batch_size=1, max_length=256, chunk_size=32,
              params=params,
              lsh=LSHConfig(K=6, L=40, num_sink_tokens=4, num_local_tokens=16,
                            generation_buffer=32))
    llm.prefill(prompt)
    off_len = int(np.asarray(llm.state.off_len)[0])
    assert off_len == window - 16  # clipped to the window, not len-sink-local
    out = np.asarray(llm.inference(np.asarray([5])))
    assert np.isfinite(out).all()
