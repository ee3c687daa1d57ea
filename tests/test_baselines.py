"""Quest / TopK / OracleSampling baselines vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from magicpig_tpu.ops.baselines import (
    oracle_sampling_decode,
    quest_decode,
    quest_landmarks,
    topk_decode,
)


def _setup(seed=0, B=1, Hq=4, Hkv=2, S=128, d=16):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, Hq, d)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    return q, k, v


def test_quest_matches_reference_semantics():
    q, k, v = _setup()
    B, Hq, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    page, budget = 16, 3
    g = Hq // Hkv
    kmin, kmax = quest_landmarks(jnp.asarray(k), page)
    np.testing.assert_allclose(
        np.asarray(kmin)[0, 0, 0], k[0, 0, :page].min(0), rtol=1e-6)
    out, lse = quest_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            kmin, kmax, jnp.asarray([S], np.int32),
                            page, budget)
    out = np.asarray(out)
    for h in range(Hq):
        kv_h = h // g
        pages = k[0, kv_h].reshape(-1, page, d)
        score = np.maximum(q[0, h] * pages.min(1), q[0, h] * pages.max(1)).sum(-1)
        top = np.argsort(-score)[:budget]
        sel = np.concatenate([np.arange(p * page, (p + 1) * page) for p in top])
        s = (k[0, kv_h, sel] @ q[0, h]) / np.sqrt(d)
        p_ = np.exp(s - s.max()); p_ /= p_.sum()
        expect = p_ @ v[0, kv_h, sel]
        np.testing.assert_allclose(out[0, h], expect, rtol=2e-3, atol=2e-3)


def test_topk_matches_exact_topk():
    q, k, v = _setup(seed=1)
    B, Hq, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    g = Hq // Hkv
    n = 13
    out, lse = topk_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray([S], np.int32), n)
    out = np.asarray(out)
    for h in range(Hq):
        s = (k[0, h // g] @ q[0, h]) / np.sqrt(d)
        sel = np.argsort(-s)[:n]
        ss = s[sel]
        p_ = np.exp(ss - ss.max()); p_ /= p_.sum()
        expect = p_ @ v[0, h // g, sel]
        np.testing.assert_allclose(out[0, h], expect, rtol=2e-3, atol=2e-3)


def test_oracle_sampling_converges_to_full_attention():
    q, k, v = _setup(seed=2)
    B, Hq, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    g = Hq // Hkv
    out, lse = oracle_sampling_decode(
        jax.random.key(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray([S], np.int32), n_samples=4096)
    out = np.asarray(out)
    # lse must be the exact log-sum-exp over the region.
    for h in range(Hq):
        s = (k[0, h // g] @ q[0, h]) / np.sqrt(d)
        expect_lse = np.log(np.exp(s - s.max()).sum()) + s.max()
        np.testing.assert_allclose(np.asarray(lse)[0, h], expect_lse,
                                   rtol=1e-4, atol=1e-4)
    for h in range(Hq):
        s = (k[0, h // g] @ q[0, h]) / np.sqrt(d)
        p_ = np.exp(s - s.max()); p_ /= p_.sum()
        expect = p_ @ v[0, h // g]
        err = np.linalg.norm(out[0, h] - expect) / np.linalg.norm(expect)
        assert err < 0.25, f"head {h}: oracle-sampling error {err}"


def test_block_topk_full_budget_matches_full_attention():
    from magicpig_tpu.ops.baselines import block_topk_decode
    from magicpig_tpu.ops.attention import full_decode

    q, k, v = _setup(seed=3)
    S = k.shape[2]
    out, lse = block_topk_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray([S], np.int32), block_size=16, budget_blocks=S // 16)
    ref_out, ref_lse = full_decode(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray([S], np.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=2e-3, atol=2e-3)


def test_block_topk_selects_high_score_blocks():
    """Plant a strongly-aligned key; the block containing it must be selected
    and dominate the output."""
    rng = np.random.default_rng(4)
    B, Hq, Hkv, S, d, bs = 1, 2, 1, 256, 16, 16
    q = rng.normal(size=(B, Hq, d)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, d)).astype(np.float32) * 0.1
    v = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    needle = 137
    k[0, 0, needle] = 10 * q[0, 0] / np.linalg.norm(q[0, 0])

    from magicpig_tpu.ops.baselines import block_topk_decode

    out, _ = block_topk_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray([S], np.int32), bs, 2)
    # head 0's output should be ~v[needle] (score dominates the softmax).
    np.testing.assert_allclose(np.asarray(out)[0, 0], v[0, 0, needle],
                               rtol=0.1, atol=0.1)


def test_block_topk_respects_length():
    q, k, v = _setup(seed=5)
    S = k.shape[2]
    ln = jnp.asarray([50], np.int32)
    out, lse = __import__("magicpig_tpu.ops.baselines",
                          fromlist=["block_topk_decode"]).block_topk_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), ln,
        block_size=16, budget_blocks=16)
    from magicpig_tpu.ops.attention import full_decode
    ref_out, ref_lse = full_decode(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), ln)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-3, atol=2e-3)
