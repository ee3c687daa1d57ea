"""Sharded-engine tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    """The driver's multi-chip dry run: tp(kv-heads) x dp(batch) mesh,
    prefill + scan-decode executes and stays finite."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_unsharded_decode():
    """Tensor-parallel decode must produce the same logits as single-device
    (the reference checks TP vs single-GPU equivalence by construction,
    README.md:159-191 — we check numerically)."""
    from magicpig_tpu.config import LSHConfig, ModelConfig
    from magicpig_tpu.parallel.mesh import make_mesh, shard_engine
    from magicpig_tpu.runtime.engine import LLM

    cfg = ModelConfig(
        name="tp-test", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=8,
        rope_theta=10000.0, rope_scaling=None,
        max_position_embeddings=1024, eos_token_ids=(0,),
        dtype=jax.numpy.float32,
    )
    lsh = LSHConfig(K=3, L=8, num_sink_tokens=2, num_local_tokens=8,
                    generation_buffer=16)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, size=60).astype(np.int32)

    ref = LLM(cfg, batch_size=1, max_length=128, chunk_size=32, lsh=lsh, seed=3)
    ref_logits = np.asarray(ref.prefill(prompt))
    ref_step = np.asarray(ref.inference(np.asarray([7])))

    tp = LLM(cfg, batch_size=1, max_length=128, chunk_size=32, lsh=lsh, seed=3)
    shard_engine(tp, make_mesh(1, 4))
    with tp.mesh:
        tp_logits = np.asarray(tp.prefill(prompt))
        tp_step = np.asarray(tp.inference(np.asarray([7])))

    np.testing.assert_allclose(tp_logits, ref_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tp_step, ref_step, rtol=2e-4, atol=2e-4)


def test_multihost_mesh_single_process():
    """make_multihost_mesh on one process spans all local devices with the
    model axis inside the host."""
    from magicpig_tpu.parallel.mesh import make_multihost_mesh

    mesh = make_multihost_mesh(n_model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = make_multihost_mesh()
    assert mesh2.shape["data"] * mesh2.shape["model"] == 8
