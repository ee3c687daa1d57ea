"""flash_prefill_pallas vs the XLA flash_prefill oracle (interpret mode).

The Pallas whole-prompt prefill kernel must reproduce the engine's existing
sub-chunked XLA prefill attention exactly (same online-softmax math, same
causal/length/window semantics) — `ops/attention.py::flash_prefill` is the
oracle, itself HF-parity-tested through the engine (tests/test_engine.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.ops.attention import flash_prefill
from magicpig_tpu.ops.pallas.prefill import flash_prefill_pallas


def _oracle(q, k, v, length, window=None):
    """Sub-chunked flash_prefill exactly as the engine's attn_scan runs it."""
    b, p, hq, d = q.shape
    sub = min(256, p)
    outs = []
    for off in range(0, p, sub):
        qj = q[:, off:off + sub]
        o = flash_prefill(qj, k, v, jnp.int32(off), jnp.int32(off + sub),
                          block_k=sub, window=window)
        outs.append(o)
    out = jnp.concatenate(outs, axis=1)
    # Mask padded-query rows: the kernel defines them as "attend the valid
    # prefix", the oracle as kv_len = off+sub; both are ignored downstream,
    # so compare valid rows only.
    return out


@pytest.mark.parametrize(
    "B,HKV,G,P,D,length,window",
    [
        (1, 2, 4, 1024, 64, 1024, None),
        (2, 2, 2, 512, 64, 300, None),       # short valid prefix + batch
        (1, 2, 4, 1024, 64, 700, 200),       # sliding window (Mistral)
        (1, 2, 2, 512, 16, 512, None),       # fold=8 (tiny test models)
        (1, 1, 4, 512, 128, 400, None),      # fold=1
        (1, 2, 1, 512, 64, 500, None),       # GQA=1 (llama-2 style)
    ])
def test_pallas_prefill_matches_oracle(B, HKV, G, P, D, length, window):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, P, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    lens = jnp.full((B,), length, jnp.int32)

    got = flash_prefill_pallas(q, k, v, lens, q_tile=128, chunk_tokens=128,
                               window=window, interpret=True)
    want = _oracle(q, k, v, length, window=window)

    gv = np.asarray(got[:, :length])
    wv = np.asarray(want[:, :length])
    err = np.abs(gv - wv).max()
    assert np.isfinite(gv).all()
    # f32 inputs stay f32 in the kernel (dtype-preserving); only online-
    # softmax reassociation vs the oracle's different chunking remains.
    assert err < 1e-4, err


def test_pallas_prefill_chunk_offset():
    """The interleaved-admission path: a chunk of queries at q_offset > 0
    against a longer KV buffer whose valid prefix ends at the chunk end."""
    rng = np.random.default_rng(2)
    B, SKV, SQ, OFF, HKV, G, D = 1, 1024, 256, 512, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, SQ, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, SKV, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, SKV, HKV, D)), jnp.float32)
    lens = jnp.asarray([OFF + SQ], jnp.int32)
    offs = jnp.asarray([OFF], jnp.int32)
    got = flash_prefill_pallas(q, k, v, lens, q_offset=offs, q_tile=128,
                               chunk_tokens=128, interpret=True)
    want = flash_prefill(q, k, v, jnp.int32(OFF), jnp.int32(OFF + SQ),
                         block_k=256)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 1e-4, err

    # Sliding window on the offset-chunk path (staged Mistral prefill).
    got_w = flash_prefill_pallas(q, k, v, lens, q_offset=offs, q_tile=128,
                                 chunk_tokens=128, window=300,
                                 interpret=True)
    want_w = flash_prefill(q, k, v, jnp.int32(OFF), jnp.int32(OFF + SQ),
                           block_k=256, window=300)
    err_w = np.abs(np.asarray(got_w) - np.asarray(want_w)).max()
    assert err_w < 1e-4, err_w


def test_engine_prefill_pallas_matches_xla():
    """Engine-level: prefill logits with the Pallas kernel (use_pallas="on",
    interpret on CPU) match the XLA sub-chunk scan, for both the one-shot
    and the interleaved (staged-chunk) prefill paths."""
    from magicpig_tpu.config import LSHConfig
    from magicpig_tpu.runtime.engine import LLM

    ids = np.asarray(np.random.default_rng(3).integers(1, 500, size=300),
                     np.int32)

    def build(up):
        lsh = LSHConfig(K=4, L=8, num_sink_tokens=4, num_local_tokens=16,
                        generation_buffer=32, use_pallas=up)
        return LLM("llama-tiny", batch_size=1, max_length=1024, lsh=lsh,
                   seed=0, chunk_size=128)

    on, off = build("on"), build("off")
    lo = np.asarray(on.prefill(ids))
    lf = np.asarray(off.prefill(ids))
    assert np.abs(lo - lf).max() < 0.05, np.abs(lo - lf).max()

    on.release_slot(0)
    h = on.start_prefill(ids, request_id=0)
    while not h.done:
        h.step()
    ls = np.asarray(h.logits)
    assert np.abs(ls - lf).max() < 0.05, np.abs(ls - lf).max()


def test_pallas_prefill_bf16_path():
    """bf16 inputs (the engine's actual dtype) stay finite and close."""
    rng = np.random.default_rng(1)
    B, P, HKV, G, D = 1, 512, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, P, HKV * G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.bfloat16)
    lens = jnp.asarray([400], jnp.int32)
    got = flash_prefill_pallas(q, k, v, lens, q_tile=256, chunk_tokens=256,
                               interpret=True)
    want = _oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32), 400)
    err = np.abs(np.asarray(got[:, :400], np.float32)
                 - np.asarray(want[:, :400])).max()
    assert got.dtype == jnp.bfloat16
    assert err < 0.1, err


def test_pallas_prefill_lse_matches_xla():
    """return_lse: the kernel's natural-base LSE must match the XLA
    flash_prefill's (the ring-prefill merge contract), including -inf on
    fully-masked (padded-query) rows."""
    rng = np.random.default_rng(4)
    B, P, HKV, G, D = 1, 512, 2, 2, 64          # gtq = 2*128 -> lane-ok
    q = jnp.asarray(rng.standard_normal((B, P, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, P, HKV, D)), jnp.float32)
    lens = jnp.asarray([400], jnp.int32)
    got_o, got_l = flash_prefill_pallas(q, k, v, lens, q_tile=128,
                                        chunk_tokens=128, interpret=True,
                                        return_lse=True)
    want_o, want_l = flash_prefill(q, k, v, jnp.int32(0), jnp.int32(400),
                                   block_k=128, return_lse=True)
    gl = np.asarray(got_l)[:, :400]
    wl = np.asarray(want_l)[:, :400]
    assert np.abs(gl - wl).max() < 1e-4
    assert np.abs(np.asarray(got_o)[:, :400]
                  - np.asarray(want_o)[:, :400]).max() < 1e-4
