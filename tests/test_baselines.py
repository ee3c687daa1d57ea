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
    out = np.asarray(oracle_sampling_decode(
        jax.random.key(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray([S], np.int32), n_samples=4096))
    for h in range(Hq):
        s = (k[0, h // g] @ q[0, h]) / np.sqrt(d)
        p_ = np.exp(s - s.max()); p_ /= p_.sum()
        expect = p_ @ v[0, h // g]
        err = np.linalg.norm(out[0, h] - expect) / np.linalg.norm(expect)
        assert err < 0.25, f"head {h}: oracle-sampling error {err}"
