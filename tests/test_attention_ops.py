"""Attention primitives vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from magicpig_tpu.ops.attention import (
    collision_mask,
    flash_prefill,
    full_decode,
    lsh_masked_decode,
    lsh_sampled_decode,
    mask_to_budget_ids,
)


def _softmax_attn(q, k, v, scale):
    s = (q @ k.T) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return p @ v


def test_flash_prefill_matches_dense_causal():
    rng = np.random.default_rng(0)
    B, Sq, Hq, Hkv, d = 2, 16, 4, 2, 32
    q_offset, kv_len, skv_max = 24, 40, 64
    q = rng.normal(size=(B, Sq, Hq, d)).astype(np.float32)
    k = rng.normal(size=(B, skv_max, Hkv, d)).astype(np.float32)
    v = rng.normal(size=(B, skv_max, Hkv, d)).astype(np.float32)

    got = np.asarray(
        flash_prefill(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      jnp.int32(q_offset), jnp.int32(kv_len), block_k=16)
    )

    g = Hq // Hkv
    scale = 1.0 / np.sqrt(d)
    for b in range(B):
        for h in range(Hq):
            kv_h = h // g
            for i in range(Sq):
                pos = q_offset + i
                lim = min(pos + 1, kv_len)
                expect = _softmax_attn(
                    q[b, i, h][None], k[b, :lim, kv_h], v[b, :lim, kv_h], scale
                )[0]
                np.testing.assert_allclose(got[b, i, h], expect, rtol=2e-4, atol=2e-4)


def test_full_decode_matches_dense():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, S, d = 2, 8, 2, 33, 16
    lengths = np.array([20, 33], np.int32)
    q = rng.normal(size=(B, Hq, d)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    out, lse = full_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(lengths))
    out, lse = np.asarray(out), np.asarray(lse)
    g = Hq // Hkv
    scale = 1.0 / np.sqrt(d)
    for b in range(B):
        for h in range(Hq):
            lim = lengths[b]
            s = (q[b, h] @ k[b, h // g, :lim].T) * scale
            expect = _softmax_attn(q[b, h][None], k[b, h // g, :lim],
                                   v[b, h // g, :lim], scale)[0]
            np.testing.assert_allclose(out[b, h], expect, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(lse[b, h],
                                       np.log(np.exp(s).sum()), rtol=1e-4)


def _lsh_setup(seed=2, B=1, Hq=8, Hkv=2, S=96, d=32, K=4, L=24):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, Hq, d)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, d)).astype(np.float32)
    kn = np.linalg.norm(k, axis=-1)
    proj = rng.normal(size=(d, K * L)).astype(np.float32)
    weights = 2 ** np.arange(K)

    def codes(x):  # [..., d] -> [..., L]
        bits = (x @ proj) > 0
        return (bits.reshape(*x.shape[:-1], L, K) * weights).sum(-1).astype(np.int32)

    qc = codes(q)                      # [B, Hq, L]
    kc = codes(k)                      # [B, Hkv, S, L]
    return q, k, v, kn, qc, kc, K, L


def test_collision_mask_matches_torch_style_oracle():
    q, k, v, kn, qc, kc, K, L = _lsh_setup()
    got = np.asarray(collision_mask(jnp.asarray(qc),
        jnp.asarray(kc.transpose(0, 1, 3, 2))))
    B, Hq, _ = qc.shape
    Hkv, S = kc.shape[1], kc.shape[2]
    g = Hq // Hkv
    for b in range(B):
        for h in range(Hq):
            expect = (qc[b, h][None, :] == kc[b, h // g]).sum(-1) >= 2
            np.testing.assert_array_equal(got[b, h], expect)
    # Sanity: sampling is actually sparse but non-empty at these params.
    frac = got.mean()
    assert 0 < frac < 0.5


def test_lsh_masked_decode_matches_numpy_oracle():
    q, k, v, kn, qc, kc, K, L = _lsh_setup()
    B, Hq, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    g = Hq // Hkv
    length = np.array([S], np.int32)
    mask = np.asarray(collision_mask(jnp.asarray(qc),
        jnp.asarray(kc.transpose(0, 1, 3, 2))))
    out, lse = lsh_masked_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn),
        jnp.asarray(mask), jnp.asarray(length), K, L)
    out, lse = np.asarray(out), np.asarray(lse)

    for b in range(B):
        for h in range(Hq):
            sel = np.where(mask[b, h])[0]
            assert len(sel) > 0
            kk, vv = k[b, h // g, sel], v[b, h // g, sel]
            raw = kk @ q[b, h]
            cs = raw / (np.linalg.norm(q[b, h]) * kn[b, h // g, sel])
            w = 1 - np.arccos(np.clip(cs, -1, 1)) / np.pi
            w = 1 - (1 - w**K) ** L - L * (1 - w**K) ** (L - 1) * (w**K)
            s = raw / np.sqrt(d) - np.log(w + 1e-4)
            p = np.exp(s - s.max())
            np.testing.assert_allclose(out[b, h], (p / p.sum()) @ vv,
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(lse[b, h], s.max() + np.log(p.sum()),
                                       rtol=1e-4)


def test_sampled_decode_equals_masked_when_budget_covers():
    q, k, v, kn, qc, kc, K, L = _lsh_setup()
    S = k.shape[2]
    length = jnp.asarray([S], jnp.int32)
    mask = collision_mask(jnp.asarray(qc), jnp.asarray(kc.transpose(0, 1, 3, 2)))
    mask = mask & (jnp.arange(S)[None, None, :] < length[:, None, None])
    ref_out, ref_lse = lsh_masked_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn),
        mask, length, K, L)
    budget = int(np.asarray(mask.sum(-1)).max()) + 8
    ids, valid = mask_to_budget_ids(mask, budget)
    out, lse = lsh_sampled_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn),
        ids, valid, K, L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=1e-4, atol=1e-4)


def test_empty_mask_head_yields_zero_output_and_neginf_lse():
    """A head with no sampled tokens must produce (0, -inf), not NaN —
    regression for a subnormal 1e-38 denominator flushing to zero."""
    from magicpig_tpu.ops.merge import merge_partials

    q, k, v, kn, qc, kc, K, L = _lsh_setup()
    S = k.shape[2]
    mask = np.array(collision_mask(jnp.asarray(qc),
        jnp.asarray(kc.transpose(0, 1, 3, 2))))
    mask[:, 0, :] = False
    out, lse = lsh_masked_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn),
        jnp.asarray(mask), jnp.asarray([S], jnp.int32), K, L)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_array_equal(np.asarray(out[0, 0]), 0.0)
    assert np.isneginf(np.asarray(lse)[0, 0])
    # Merging with a dense partial recovers the dense result for that head.
    o_d, l_d = full_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray([S], jnp.int32))
    merged, _ = merge_partials([out, o_d], [lse, l_d])
    assert bool(jnp.isfinite(merged).all())
    np.testing.assert_allclose(np.asarray(merged[0, 0]), np.asarray(o_d[0, 0]),
                               rtol=1e-5, atol=1e-6)


def test_masked_plus_dense_merge_approximates_full_attention():
    """The whole estimator: sampled offload partial + dense local partial
    merged by LSE should approximate full attention over all tokens.

    LSH importance sampling assumes a concentrated attention distribution
    (the real-model regime): we plant a handful of keys with high cosine
    similarity to each query; those carry the softmax mass and collide in
    >=2 tables with near-certainty, so the estimator must recover them."""
    from magicpig_tpu.ops.merge import merge_partials

    rng = np.random.default_rng(7)
    B, Hq, Hkv, S_off, S_loc, d, K, L = 1, 4, 4, 512, 32, 64, 8, 75
    q = rng.normal(size=(B, Hq, d)).astype(np.float32)
    k_all = rng.normal(size=(B, Hkv, S_off + S_loc, d)).astype(np.float32)
    v_all = rng.normal(size=(B, Hkv, S_off + S_loc, d)).astype(np.float32)
    # Plant 6 high-similarity keys per head in the offload region.
    for h in range(Hkv):
        hot = rng.choice(S_off, size=6, replace=False)
        qn = q[0, h] / np.linalg.norm(q[0, h])
        k_all[0, h, hot] = (
            8.0 * qn[None, :] + 0.5 * rng.normal(size=(6, d))
        ).astype(np.float32)
    k_off, v_off = k_all[:, :, :S_off], v_all[:, :, :S_off]
    k_loc, v_loc = k_all[:, :, S_off:], v_all[:, :, S_off:]

    avg = k_off.mean(2, keepdims=True)
    k_off_c = k_off - avg
    k_loc_c = k_loc - avg
    kn = np.linalg.norm(k_off_c, axis=-1)

    proj = rng.normal(size=(d, K * L)).astype(np.float32)
    weights = 2 ** np.arange(K)

    def codes(x):
        bits = (x @ proj) > 0
        return (bits.reshape(*x.shape[:-1], L, K) * weights).sum(-1).astype(np.int32)

    mask = collision_mask(jnp.asarray(codes(q)),
        jnp.asarray(codes(k_off_c).transpose(0, 1, 3, 2)))
    length = jnp.asarray([S_off], jnp.int32)
    o_s, l_s = lsh_masked_decode(
        jnp.asarray(q), jnp.asarray(k_off_c), jnp.asarray(v_off),
        jnp.asarray(kn), mask, length, K, L)
    o_d, l_d = full_decode(jnp.asarray(q), jnp.asarray(k_loc_c),
                           jnp.asarray(v_loc), jnp.asarray([S_loc], jnp.int32))
    merged, _ = merge_partials([o_s, o_d], [l_s, l_d])
    merged = np.asarray(merged)

    # Oracle: full attention with the same centering (exact softmax identity).
    k_all_c = np.concatenate([k_off_c, k_loc_c], axis=2)
    scale = 1.0 / np.sqrt(d)
    for h in range(Hq):
        expect = _softmax_attn(q[0, h][None], k_all_c[0, h], v_all[0, h], scale)[0]
        err = np.linalg.norm(merged[0, h] - expect) / np.linalg.norm(expect)
        assert err < 0.15, f"head {h}: sampled-attention relative error {err}"


def _dense_causal_loss(q, k, v, q_offset, kv_len, window=None):
    """Dense differentiable reference for the custom-VJP training path."""
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, sq, d)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qh, kh) / jnp.sqrt(float(d))
    q_pos = q_offset + jnp.arange(sq)
    k_pos = jnp.arange(skv)
    mask = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < kv_len)
    if window is not None:
        mask = mask & (q_pos[:, None] - k_pos[None, :] < window)
    s = jnp.where(mask[None, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)  # fully-masked rows
    o = jnp.einsum("bhgqk,bhkd->bhgqd", p, vh)
    return o.reshape(b, hq, sq, d).transpose(0, 2, 1, 3)


def test_flash_prefill_custom_vjp_grads():
    """differentiable=True grads (custom VJP, chunked backward) must match
    autodiff of the dense reference — incl. GQA, a causal offset, a partial
    kv_len, and a weighted loss so do varies per position."""
    rng = np.random.default_rng(7)
    B, Sq, Hq, Hkv, d = 2, 8, 4, 2, 16
    skv, q_offset, kv_len = 32, 20, 26
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, skv, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, skv, Hkv, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, Sq, Hq, d)), jnp.float32)

    def loss_fast(q, k, v):
        o = flash_prefill(q, k, v, jnp.int32(q_offset), jnp.int32(kv_len),
                          block_k=8, differentiable=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(_dense_causal_loss(q, k, v, q_offset, kv_len) * w)

    out_fast = loss_fast(q, k, v)
    out_ref = loss_ref(q, k, v)
    np.testing.assert_allclose(float(out_fast), float(out_ref), rtol=1e-5)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_flash_prefill_custom_vjp_grads_window():
    """Same with a sliding window active (fully-masked early rows exist)."""
    rng = np.random.default_rng(8)
    B, Sq, Hq, Hkv, d = 1, 16, 2, 2, 8
    skv = 16
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, skv, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, skv, Hkv, d)), jnp.float32)

    def loss_fast(q, k, v):
        o = flash_prefill(q, k, v, jnp.int32(0), jnp.int32(16), block_k=8,
                          window=4, differentiable=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dense_causal_loss(q, k, v, 0, 16, window=4) ** 2)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_flash_prefill_custom_vjp_under_jit_and_checkpoint():
    """The trainer wraps the layer in jax.checkpoint under jit — the VJP
    must survive remat (float0 cotangents for the int operands)."""
    rng = np.random.default_rng(9)
    B, Sq, Hq, Hkv, d = 1, 8, 2, 1, 8
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Sq, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Sq, Hkv, d)), jnp.float32)

    @jax.jit
    def loss(q, k, v):
        @jax.checkpoint
        def inner(q):
            o = flash_prefill(q, k, v, jnp.int32(0), jnp.int32(Sq),
                              block_k=8, differentiable=True)
            return jnp.sum(o ** 2)
        return inner(q)

    g = jax.grad(loss)(q, k, v)
    assert np.isfinite(np.asarray(g)).all()
