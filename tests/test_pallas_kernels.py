"""Pallas kernels vs XLA oracles (interpreter mode on the CPU mesh).

Mirrors the reference's kernel test strategy: every native kernel is checked
against a pure-framework oracle (`library/sparse_attention/test.py`,
`library/lsh/test.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.ops.attention import full_decode, lsh_masked_decode
from magicpig_tpu.ops.bitcodes import (
    build_planes,
    build_planes_blocked,
    collision_words,
    plane_block,
    hash_bits,
    unpack_words,
    valid_words,
)
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.pallas.decode import flash_decode
from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode


def _fold_scale(sc, D):
    """Token-order per-row scale [B,Hkv,S] -> fold-major [B,Hkv,fold,S/fold]."""
    fold = max(128 // D, 1)
    b, hkv, s = sc.shape
    return sc.reshape(b, hkv, s // fold, fold).transpose(0, 1, 3, 2)


@pytest.mark.parametrize("B,HKV,G,S,D,BLK", [
    (2, 2, 4, 256, 64, 64),
    (1, 2, 2, 256, 128, 128),
    (1, 2, 4, 512, 16, 128),
])
def test_flash_decode_matches_full_decode(B, HKV, G, S, D, BLK):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    length = jnp.asarray(rng.integers(1, S, (B,)), jnp.int32)
    o1, l1 = full_decode(q, k, v, length)
    o2, l2 = flash_decode(q, k, v, length, block_tokens=BLK, interpret=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=2e-3, atol=2e-3)
    # zero length -> (0, -inf)
    o3, l3 = flash_decode(q, k, v, jnp.zeros((B,), jnp.int32),
                          block_tokens=BLK, interpret=True)
    assert np.all(np.asarray(o3) == 0)
    assert np.all(np.isneginf(np.asarray(l3)))


@pytest.mark.parametrize("B,HKV,G,S,D,BLK", [
    (2, 2, 4, 256, 64, 64),
    (1, 2, 2, 256, 128, 128),
    (1, 2, 4, 512, 16, 128),
])
def test_flash_decode_int8_matches_dequant_oracle(B, HKV, G, S, D, BLK):
    """int8 dense-cache path (dense_quant): in-register dequant equals the
    dequantize-then-attend oracle."""
    from magicpig_tpu.ops.quant import dequantize_rows, quantize_rows

    rng = np.random.default_rng(11)
    fold = max(128 // D, 1)
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    length = jnp.asarray(rng.integers(1, S, (B,)), jnp.int32)
    kd = dequantize_rows(kq, ks, jnp.float32)
    vd = dequantize_rows(vq, vs, jnp.float32)
    want, want_lse = full_decode(q, kd, vd, length)
    kf = kq.reshape(B, HKV, S // fold, fold * D)
    vf = vq.reshape(B, HKV, S // fold, fold * D)
    got, got_lse = flash_decode(q, kf, vf, length, block_tokens=BLK,
                                interpret=True,
                                k_scale=_fold_scale(ks, D),
                                v_scale=_fold_scale(vs, D))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("B,HKV,G,S,D,K,L,BLK", [
    (1, 2, 4, 256, 64, 6, 20, 128),
    (2, 2, 2, 512, 128, 10, 30, 128),
    (1, 2, 4, 512, 16, 4, 8, 256),
])
def test_lsh_fused_matches_masked_oracle(B, HKV, G, S, D, K, L, BLK):
    rng = np.random.default_rng(1)
    HQ = HKV * G
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    knorm = jnp.linalg.norm(kc.astype(jnp.float32), axis=-1)
    proj = make_hash_projections(jax.random.key(1), D, K, L)
    # Oracle mask from the FLAT layout; the production call gets the
    # BLOCKED layout of the same keys (the sampled token set is layout-
    # independent, only the word packing differs).
    planes = jax.vmap(lambda kb: build_planes(
        kb.transpose(1, 0, 2), proj, K, chunk=64))(kc)
    fold = max(128 // D, 1)
    blk = plane_block(S, fold)
    planes_b = jax.vmap(lambda kb: build_planes_blocked(
        kb.transpose(1, 0, 2), proj, K, blk, fold))(kc)
    qb = hash_bits(q, proj, K)
    length = jnp.asarray(rng.integers(S // 2, S, (B,)), jnp.int32)

    words = collision_words(qb, planes)
    words = words & valid_words(length, S // 32)[:, None]
    mask = unpack_words(words, S)
    o1, l1 = lsh_masked_decode(q, kc, vc, knorm, mask, length, K, L)

    o2, l2, cnt = lsh_fused_decode(q, kc, vc, knorm, planes_b, qb, length,
                                   K, L, block_tokens=BLK, interpret=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_array_equal(np.asarray(cnt),
                                  np.asarray(mask.sum(-1), np.float32))

    if B > 1:
        # The per-request split (the B>=2 toolchain workaround the server
        # enables, runtime/server.py::_lsh_partial) is the same program per
        # slice — bit-identical to the batched grid.
        o3, l3, c3 = lsh_fused_decode(q, kc, vc, knorm, planes_b, qb,
                                      length, K, L, block_tokens=BLK,
                                      interpret=True, batch_split=True)
        np.testing.assert_array_equal(np.asarray(o3), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(l3), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(c3), np.asarray(cnt))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("D", [64, 128])
def test_exact_scores_kernel(quant, D):
    from magicpig_tpu.ops.pallas.score import exact_scores
    from magicpig_tpu.ops.quant import quantize_rows, dequantize_rows

    rng = np.random.default_rng(2)
    B, HKV, G, S = 1, 2, 4, 512
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    if quant:
        kq, ks = quantize_rows(k)
        got = exact_scores(q, kq, _fold_scale(ks, D), block_tokens=256,
                           interpret=True)
        kref = dequantize_rows(kq, ks, jnp.float32)
    else:
        got = exact_scores(q, k.astype(jnp.bfloat16), None,
                           block_tokens=256, interpret=True)
        kref = k.astype(jnp.bfloat16)
    ref = jnp.einsum("bhgd,bhsd->bhgs",
                     q.astype(jnp.bfloat16).reshape(B, HKV, G, D), kref,
                     preferred_element_type=jnp.float32) / np.sqrt(D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_collision_words_pallas_matches_xla():
    from magicpig_tpu.ops.bitcodes import collision_words
    from magicpig_tpu.ops.pallas.mask import collision_words_pallas

    rng = np.random.default_rng(5)
    B, HKV, G, L, K, W = 1, 2, 4, 30, 6, 256
    q_bits = jnp.asarray(rng.integers(0, 2, (B, HKV * G, L, K)), jnp.int32)
    planes = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, (B, HKV, L, K, W)), jnp.int32)
    want = collision_words(q_bits, planes)
    got = collision_words_pallas(q_bits, planes, K, L, block_words=128,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("D,NBP", [(64, 3), (128, 3), (64, 16)])
def test_block_attend_matches_block_topk(quant, D, NBP):
    from magicpig_tpu.ops.baselines import block_topk_decode
    from magicpig_tpu.ops.pallas.block_attend import block_attend
    from magicpig_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(6)
    # NBP=16 exercises the production single-chunk (ch=16) path.
    B, HKV, G, BS = 1, 2, 4, 128
    S = 2048 if NBP == 16 else 1024
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    length = jnp.asarray([S - 124], jnp.int32)

    qh = q.reshape(B, HKV, G, D)
    scores = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                        preferred_element_type=jnp.float32) / np.sqrt(D)
    valid = (jnp.arange(S)[None, :] < length[:, None])[:, None, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    nb = S // BS
    blk_sc = scores.reshape(B, HKV, G, nb, BS).max(axis=(2, 4))
    _, blk_ids = jax.lax.top_k(blk_sc, NBP)
    fold = max(128 // D, 1)
    # token order -> fold-major layout (row f*G+g, col c = token c*fold+f)
    scores_f = scores.reshape(B, HKV, G, S // fold, fold).transpose(
        0, 1, 4, 2, 3).reshape(B, HKV, fold * G, S // fold)

    if quant:
        vq, vscale = quantize_rows(v)
        v_in = vq.reshape(B, HKV, S // fold, 128) if fold > 1 else vq
        vd = (vq.astype(jnp.float32) * vscale[..., None])
        want, want_lse = block_topk_decode(
            q, k, vd.astype(jnp.float32), length, BS, NBP, scores=scores)
        got, got_lse = block_attend(scores_f, blk_ids, v_in,
                                    _fold_scale(vscale, D), BS, D,
                                    interpret=True)
        tol = 2e-2
    else:
        want, want_lse = block_topk_decode(q, k, v, length, BS, NBP,
                                           scores=scores)
        got, got_lse = block_attend(scores_f, blk_ids, v, None, BS, D,
                                    interpret=True)
        tol = 3e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=tol, atol=tol)


def test_lsh_fused_int8_matches_dequant_oracle():
    from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode
    from magicpig_tpu.ops.quant import quantize_rows, dequantize_rows

    rng = np.random.default_rng(9)
    B, HKV, G, S, D, K, L = 2, 2, 4, 512, 64, 6, 20
    HQ = HKV * G
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    kq, ks = quantize_rows(kc)
    vq, vs = quantize_rows(vc)
    kd = dequantize_rows(kq, ks, jnp.float32)
    vd = dequantize_rows(vq, vs, jnp.float32)
    knorm = jnp.linalg.norm(kd, axis=-1)
    proj = make_hash_projections(jax.random.key(1), D, K, L)
    fold8 = max(128 // D, 1)
    planes = jax.vmap(lambda kb: build_planes_blocked(
        kb.transpose(1, 0, 2), proj, K, plane_block(S, fold8), fold8))(kd)
    qb = hash_bits(q, proj, K)
    length = jnp.asarray([450, 300], jnp.int32)

    # oracle: dequantized bf16-ish path through the same fused op
    o1, l1, c1 = lsh_fused_decode(q, kd, vd, knorm, planes, qb, length,
                                  K, L, block_tokens=128, interpret=True)
    fold = 128 // D
    o2, l2, c2 = lsh_fused_decode(
        q, kq.reshape(B, HKV, S // fold, 128),
        vq.reshape(B, HKV, S // fold, 128), knorm, planes, qb, length,
        K, L, block_tokens=128, interpret=True,
        k_scale=_fold_scale(ks, D), v_scale=_fold_scale(vs, D))
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))

    # Per-request split on the quantized path (what the engine runs at
    # B>=2 with int8 offload) is bit-identical to the batched grid.
    o3, l3, c3 = lsh_fused_decode(
        q, kq.reshape(B, HKV, S // fold, 128),
        vq.reshape(B, HKV, S // fold, 128), knorm, planes, qb, length,
        K, L, block_tokens=128, interpret=True,
        k_scale=_fold_scale(ks, D), v_scale=_fold_scale(vs, D),
        batch_split=True)
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(c3), np.asarray(c2))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("D", [32, 64, 128])
def test_exact_scores_ranked_fused_mask_and_blockmax(quant, D):
    """The fused scorer's additive length mask + in-kernel block-max must
    equal the unfused pipeline (scores -> XLA where -> reshape/max)."""
    from magicpig_tpu.ops.pallas.score import (
        exact_scores,
        exact_scores_ranked,
        length_mask,
    )
    from magicpig_tpu.ops.quant import dequantize_rows, quantize_rows

    rng = np.random.default_rng(3)
    # block_tokens=512 with BS=64 -> 8 ranking blocks per grid step (the
    # block-max store needs a multiple of 8 rows, or one step covering S).
    B, HKV, G, S, BS = 2, 2, 4, 1024, 64
    fold = max(128 // D, 1)
    length = jnp.asarray([S - 37, S // 2], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    if quant:
        kq, ks = quantize_rows(k)
        karg, sarg = kq, _fold_scale(ks, D)
        kref = dequantize_rows(kq, ks, jnp.float32)
    else:
        karg, sarg = k.astype(jnp.bfloat16), None
        kref = k.astype(jnp.bfloat16)

    mask = length_mask(length, S, fold)
    scores_f, blk_max = exact_scores_ranked(q, karg, sarg, mask, BS,
                                            block_tokens=512, interpret=True)

    # Oracle: token-order scores, where-masked, per-block GQA max.
    ref = jnp.einsum("bhgd,bhsd->bhgs",
                     q.astype(jnp.bfloat16).reshape(B, HKV, G, D), kref,
                     preferred_element_type=jnp.float32) / np.sqrt(D)
    valid = (jnp.arange(S)[None, :] < length[:, None])[:, None, None]
    ref = jnp.where(valid, ref, -jnp.inf)
    ref_bm = ref.reshape(B, HKV, G, S // BS, BS).max(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(blk_max), np.asarray(ref_bm),
                               rtol=2e-2, atol=2e-2)

    # The masked fold-major scores reorder to the masked token-order ref.
    got = scores_f.reshape(B, HKV, fold, G, S // fold)
    got = got.transpose(0, 1, 3, 4, 2).reshape(B, HKV, G, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_lsh_fused_odd_L_fallback_matches_oracle():
    """Odd L cannot use the paired-table fused kernel; the dispatch must
    fall back to the two-stage path with BLOCKED unpack and still match
    the masked oracle."""
    from magicpig_tpu.ops.bitcodes import (unpack_words_blocked,
                                           valid_words_blocked)
    rng = np.random.default_rng(11)
    B, HKV, G, S, D, K, L = 1, 2, 4, 256, 64, 6, 21
    HQ = HKV * G
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    knorm = jnp.linalg.norm(kc, axis=-1)
    proj = make_hash_projections(jax.random.key(2), D, K, L)
    fold = 2
    blk = plane_block(S, fold)
    planes_b = jax.vmap(lambda kb: build_planes_blocked(
        kb.transpose(1, 0, 2), proj, K, blk, fold))(kc)
    qb = hash_bits(q, proj, K)
    length = jnp.asarray([200], jnp.int32)

    words = collision_words(qb, planes_b)
    words = words & valid_words_blocked(length, S, blk, fold)[:, None]
    mask = unpack_words_blocked(words, blk, fold, S)
    o1, l1 = lsh_masked_decode(q, kc, vc, knorm, mask, length, K, L)
    o2, l2, cnt = lsh_fused_decode(q, kc, vc, knorm, planes_b, qb, length,
                                   K, L, block_tokens=128, interpret=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_array_equal(np.asarray(cnt),
                                  np.asarray(mask.sum(-1), np.float32))


def test_lsh_fused_debias_none():
    """debias='none' drops the importance reweight in BOTH the fused
    kernel and the XLA oracle (the budget-matched diagnostic row)."""
    rng = np.random.default_rng(12)
    B, HKV, G, S, D, K, L = 1, 2, 2, 256, 64, 6, 20
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    knorm = jnp.linalg.norm(kc, axis=-1)
    proj = make_hash_projections(jax.random.key(3), D, K, L)
    fold = 2
    blk = plane_block(S, fold)
    planes_b = jax.vmap(lambda kb: build_planes_blocked(
        kb.transpose(1, 0, 2), proj, K, blk, fold))(kc)
    qb = hash_bits(q, proj, K)
    length = jnp.asarray([S], jnp.int32)
    from magicpig_tpu.ops.bitcodes import unpack_words_blocked
    words = collision_words(qb, planes_b)
    mask = unpack_words_blocked(words, blk, fold, S)
    o1, l1 = lsh_masked_decode(q, kc, vc, knorm, mask, length, K, L,
                               debias="none")
    o2, l2, _ = lsh_fused_decode(q, kc, vc, knorm, planes_b, qb, length,
                                 K, L, interpret=True, debias="none")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=3e-3, atol=3e-3)
    # and it differs from the debiased result (the knob does something)
    o3, _, _ = lsh_fused_decode(q, kc, vc, knorm, planes_b, qb, length,
                                K, L, interpret=True)
    assert np.abs(np.asarray(o3) - np.asarray(o2)).max() > 1e-4
