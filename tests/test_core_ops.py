"""Core math ops vs numpy/torch oracles.

Oracle formulas mirror the reference's pure-torch test references
(`library/sparse_attention/test_sparse.py:72-79`, `library/lsh/test.py:43`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import preset
from magicpig_tpu.ops import (
    apply_rope,
    collision_weight,
    debias_scores,
    hash_codes,
    make_hash_projections,
    merge_partials,
    pack_bits,
    rms_norm,
    rope_cos_sin,
    top_p_sample,
)


def test_pack_bits_binary_weights():
    bits = np.zeros((3, 2, 4), dtype=bool)  # [n, L=2, K=4]
    bits[0, 0] = [1, 0, 0, 0]   # -> 1
    bits[1, 0] = [0, 1, 0, 1]   # -> 2 + 8 = 10
    bits[2, 1] = [1, 1, 1, 1]   # -> 15
    codes = np.asarray(pack_bits(jnp.asarray(bits), K=4))
    assert codes[0, 0] == 1 and codes[0, 1] == 0
    assert codes[1, 0] == 10
    assert codes[2, 1] == 15


def test_hash_codes_match_numpy_oracle():
    rng = np.random.default_rng(0)
    K, L, d = 6, 9, 32
    proj = np.asarray(make_hash_projections(jax.random.key(1), d, K, L))
    x = rng.normal(size=(17, d)).astype(np.float32)
    codes = np.asarray(hash_codes(jnp.asarray(x), jnp.asarray(proj), K))
    bits = (x @ proj) > 0
    expect = (bits.reshape(17, L, K) * (2 ** np.arange(K))).sum(-1)
    np.testing.assert_array_equal(codes, expect)
    # Scale invariance (reference normalizes q before hashing; sign unchanged)
    codes2 = np.asarray(hash_codes(jnp.asarray(3.7 * x), jnp.asarray(proj), K))
    np.testing.assert_array_equal(codes, codes2)


def test_collision_weight_formula():
    """w = 1 - (1-p^K)^L - L (1-p^K)^(L-1) p^K with p = 1 - theta/pi."""
    K, L = 10, 150
    cos = np.linspace(-0.99, 0.99, 41)
    w = np.asarray(collision_weight(jnp.asarray(cos), K, L))
    theta = np.arccos(cos)
    p = (1 - theta / np.pi) ** K
    expect = 1 - (1 - p) ** L - L * (1 - p) ** (L - 1) * p
    # f32 vs f64: catastrophic cancellation near w ~ 0 leaves ~5e-6 absolute
    # noise; immaterial because the estimator adds 1e-4 before the log.
    np.testing.assert_allclose(w, expect, rtol=1e-4, atol=1e-5)
    assert np.all(w >= -1e-5) and np.all(w <= 1 + 1e-5)
    # Monotone increasing in cos similarity (up to f32 noise).
    assert np.all(np.diff(w) >= -1e-5)


def test_debias_scores_matches_reference_oracle():
    """Replicates test_sparse.py:72-79 math end-to-end."""
    rng = np.random.default_rng(2)
    K, L, d, n = 10, 150, 64, 37
    q = rng.normal(size=(d,)).astype(np.float32)
    k = rng.normal(size=(n, d)).astype(np.float32)
    raw = k @ q
    qn = np.linalg.norm(q)
    kn = np.linalg.norm(k, axis=-1)
    got = np.asarray(
        debias_scores(jnp.asarray(raw), jnp.asarray(qn), jnp.asarray(kn), d, K, L)
    )
    cs = raw / (qn * kn)
    theta = np.arccos(np.clip(cs, -1, 1))
    weight = 1 - theta / np.pi
    weight = 1 - (1 - weight**K) ** L - L * ((1 - weight**K) ** (L - 1)) * (weight**K)
    expect = raw / np.sqrt(d) - np.log(weight + 1e-4)
    # f32 arccos/log vs the f64 oracle: ~3e-4 relative on the logits.
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=5e-3)


def test_merge_partials_equals_joint_softmax():
    """Merging disjoint softmax partials == softmax over the union."""
    rng = np.random.default_rng(3)
    d, n1, n2 = 16, 11, 23
    s1 = rng.normal(size=(n1,)).astype(np.float32) * 3
    s2 = rng.normal(size=(n2,)).astype(np.float32) * 3
    v1 = rng.normal(size=(n1, d)).astype(np.float32)
    v2 = rng.normal(size=(n2, d)).astype(np.float32)

    def partial(s, v):
        m = s.max()
        p = np.exp(s - m)
        return (p @ v) / p.sum(), m + np.log(p.sum())

    o1, l1 = partial(s1, v1)
    o2, l2 = partial(s2, v2)
    got, got_lse = merge_partials(
        [jnp.asarray(o1), jnp.asarray(o2)], [jnp.asarray(l1), jnp.asarray(l2)]
    )
    s = np.concatenate([s1, s2])
    v = np.concatenate([v1, v2])
    p = np.exp(s - s.max())
    expect = (p @ v) / p.sum()
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_lse), s.max() + np.log(p.sum()), rtol=1e-5
    )


def test_merge_partials_empty_partial_is_identity():
    o = jnp.asarray(np.ones((4,), np.float32))
    l = jnp.asarray(np.float32(1.5))
    empty = jnp.zeros((4,), jnp.float32)
    got, got_lse = merge_partials([o, empty], [l, jnp.float32(-jnp.inf)])
    np.testing.assert_allclose(np.asarray(got), np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lse), 1.5, rtol=1e-6)


def test_rms_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    eps = 1e-5
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps))
    xt = torch.tensor(x)
    expect = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + eps) * torch.tensor(w)
    np.testing.assert_allclose(got, expect.numpy(), rtol=1e-5, atol=1e-5)


def test_rope_matches_hf_llama():
    """cos/sin caches + rotate-half equal HF's LlamaRotaryEmbedding."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import (
        LlamaRotaryEmbedding,
        apply_rotary_pos_emb,
    )

    cfg = preset("llama-3.1-8b")
    hf = HFConfig(
        hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_scaling={
            "rope_type": "llama3",
            "factor": cfg.rope_scaling.factor,
            "low_freq_factor": cfg.rope_scaling.low_freq_factor,
            "high_freq_factor": cfg.rope_scaling.high_freq_factor,
            "original_max_position_embeddings":
                cfg.rope_scaling.original_max_position_embeddings,
        },
    )
    rot = LlamaRotaryEmbedding(config=hf)
    S, H, d = 7, 2, cfg.head_dim
    positions = np.array([0, 3, 100, 1000, 5000, 20000, 90000])
    x = np.random.default_rng(5).normal(size=(1, S, H, d)).astype(np.float32)

    pos_t = torch.tensor(positions)[None]
    cos_t, sin_t = rot(torch.tensor(x), pos_t)
    xq = torch.tensor(x).transpose(1, 2)  # [1,H,S,d]
    expect, _ = apply_rotary_pos_emb(xq, xq, cos_t, sin_t)
    expect = expect.transpose(1, 2).numpy()

    cos, sin = rope_cos_sin(cfg, 98304)
    got = np.asarray(
        apply_rope(jnp.asarray(x), cos, sin, jnp.asarray(positions)[None])
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_top_p_sampling_respects_nucleus():
    # Distribution where top-2 tokens cover > 0.9: only they may be sampled.
    logits = jnp.log(jnp.asarray([[0.6, 0.35, 0.04, 0.01]], jnp.float32))
    keys = jax.random.split(jax.random.key(0), 200)
    samples = np.asarray(
        jax.vmap(lambda k: top_p_sample(k, logits, temperature=1.0, top_p=0.9))(keys)
    )
    assert set(np.unique(samples)) <= {0, 1}
    assert (samples == 0).mean() > 0.4  # roughly follows probabilities


def test_profiling_utils():
    import time as _time

    from magicpig_tpu.utils.profiling import StepTimer, annotate, trace

    with trace(None):  # no-op path
        with annotate("region"):
            pass
    t = StepTimer()
    with t:
        _time.sleep(0.01)
    t.step(10)
    assert t.ms_per_token > 0
    assert t.tokens_per_s > 0
    assert "ms/token" in t.report()


def test_quantize_rows_bit_widths():
    from magicpig_tpu.ops.quant import dequantize_rows, quantize_rows

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 64, 32)), jnp.float32)
    for bits, qmax in ((8, 127), (4, 7)):
        q, s = quantize_rows(x, bits)
        assert q.dtype == jnp.int8
        vals = np.asarray(q)
        assert vals.max() <= qmax and vals.min() >= -qmax
        xd = np.asarray(dequantize_rows(q, s, jnp.float32))
        # Per-row symmetric grid: error bounded by scale/2 per element.
        err = np.abs(xd - np.asarray(x))
        bound = np.asarray(s)[..., None] / 2 + 1e-6
        assert (err <= bound).all()
    # Zero rows quantize to exact zeros.
    q, s = quantize_rows(jnp.zeros((2, 4, 8)), 4)
    assert not np.asarray(q).any() and not np.asarray(s).any()
