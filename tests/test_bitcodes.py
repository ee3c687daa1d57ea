"""Bit-plane packed collision scan vs the int16-code oracle.

The packed path must reproduce `ops.attention.collision_mask` (which itself
matches the reference's `(q_hashcode == k_hashcode).sum(-1) >= 2`,
`evaluations/RULER/pred/cache_ref.py:133`) bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.ops.attention import collision_mask
from magicpig_tpu.ops.bitcodes import (
    build_planes,
    collision_words,
    hash_bits,
    pack_bitplanes,
    unpack_words,
    valid_words,
)
from magicpig_tpu.ops.hashing import hash_codes, make_hash_projections, pack_bits


@pytest.mark.parametrize("K,L,S", [(4, 8, 64), (10, 150, 512), (8, 50, 256)])
def test_collision_words_match_int16_oracle(K, L, S):
    key = jax.random.key(0)
    B, HKV, G, D = 2, 2, 4, 32
    HQ = HKV * G
    kk, kq, kp = jax.random.split(key, 3)
    keys = jax.random.normal(kk, (B, HKV, S, D))
    qs = jax.random.normal(kq, (B, HQ, D))
    proj = make_hash_projections(kp, D, K, L)

    # Oracle: int16 codes + compare
    k_codes = hash_codes(keys, proj, K).astype(jnp.int16)       # [B,HKV,S,L]
    oracle = collision_mask(hash_codes(qs, proj, K),
                            k_codes.transpose(0, 1, 3, 2))       # [B,HQ,S]

    # Packed path
    k_bits = hash_bits(keys, proj, K)                            # [B,HKV,S,L,K]
    planes = pack_bitplanes(k_bits)                              # [B,HKV,L,K,W]
    q_bits = hash_bits(qs, proj, K)                              # [B,HQ,L,K]
    words = collision_words(q_bits, planes)                      # [B,HQ,W]
    got = unpack_words(words, S)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(oracle))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (3, 96, 5, 4))                     # [.., S, L, K]
    planes = pack_bitplanes(jnp.asarray(bits))
    assert planes.shape == (3, 5, 4, 3)
    # Unpack one plane back: word w bit j == bits[.., w*32+j, l, k]
    for l in range(5):
        for k in range(4):
            w = np.asarray(planes)[..., l, k, :]
            got = (w[..., :, None] >> np.arange(32)) & 1
            got = got.reshape(3, 96)
            np.testing.assert_array_equal(got, bits[..., l, k].reshape(3, 96))


def test_hash_bits_consistent_with_codes():
    key = jax.random.key(1)
    K, L, D = 6, 10, 16
    proj = make_hash_projections(key, D, K, L)
    x = jax.random.normal(jax.random.key(2), (7, D))
    bits = hash_bits(x, proj, K)                                 # [7, L, K]
    codes = hash_codes(x, proj, K)                               # [7, L]
    np.testing.assert_array_equal(np.asarray(pack_bits(bits, K)),
                                  np.asarray(codes))


def test_build_planes_chunked_equals_direct():
    key = jax.random.key(3)
    S, H, D, K, L = 256, 2, 16, 5, 6
    keys = jax.random.normal(key, (S, H, D))
    proj = make_hash_projections(jax.random.key(4), D, K, L)
    direct = pack_bitplanes(hash_bits(keys, proj, K).transpose(1, 0, 2, 3))
    chunked = build_planes(keys, proj, K, chunk=64)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(direct))


def test_build_planes_non_divisible_default_chunk():
    """S > chunk with S % chunk != 0 (e.g. the 8448-token offload capacity
    of an 8K context vs the 8192 default) must fall back to the largest
    WORD-multiple divisor, not assert."""
    key = jax.random.key(5)
    S, H, D, K, L = 8448, 1, 16, 2, 3
    keys = jax.random.normal(key, (S, H, D))
    proj = make_hash_projections(jax.random.key(6), D, K, L)
    direct = pack_bitplanes(hash_bits(keys, proj, K).transpose(1, 0, 2, 3))
    chunked = build_planes(keys, proj, K)   # default chunk=8192
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(direct))


def test_valid_words():
    lens = jnp.asarray([0, 1, 31, 32, 33, 64, 70])
    vw = np.asarray(valid_words(lens, 3))
    for i, ln in enumerate([0, 1, 31, 32, 33, 64, 70]):
        bits = (vw[i][:, None] >> np.arange(32)) & 1
        bits = bits.reshape(-1)
        expect = (np.arange(96) < ln).astype(bits.dtype)
        np.testing.assert_array_equal(bits, expect)


def test_collision_words_pallas_bit_exact():
    """Pallas >=2-of-L scan (interpret mode) == the XLA fori-loop scan."""
    import jax

    from magicpig_tpu.ops.pallas.collide import collision_words_pallas

    rng = np.random.default_rng(11)
    B, HKV, G, L, K, W = 2, 2, 4, 13, 5, 16
    q_bits = jnp.asarray(rng.integers(0, 2, (B, HKV * G, L, K)), jnp.int32)
    planes = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (B, HKV, L, K, W)), jnp.int32)
    want = np.asarray(collision_words(q_bits, planes))
    got = np.asarray(collision_words_pallas(q_bits, planes, word_block=8,
                                            interpret=True))
    np.testing.assert_array_equal(got, want)


def test_collision_words_pallas_bit_exact_production_shape():
    """Production L=150/K=10 shape (odd L exercises the tree's leftover
    carry) at a small W."""
    import jax

    from magicpig_tpu.ops.pallas.collide import collision_words_pallas

    rng = np.random.default_rng(12)
    B, HKV, G, L, K, W = 1, 2, 4, 150, 10, 32
    q_bits = jnp.asarray(rng.integers(0, 2, (B, HKV * G, L, K)), jnp.int32)
    planes = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (B, HKV, L, K, W)), jnp.int32)
    want = np.asarray(collision_words(q_bits, planes))
    got = np.asarray(collision_words_pallas(q_bits, planes, word_block=16,
                                            interpret=True))
    np.testing.assert_array_equal(got, want)


# -- blocked (fused-kernel) plane layout --------------------------------------


def _blocked_oracle_word_of_token(t, blk, fold):
    """Token t -> (word index, bit) in the blocked layout (numpy oracle)."""
    rows, wb = blk // fold, blk // 32
    c, t_loc = divmod(t, blk)
    r, f = t_loc // fold, t_loc % fold
    m = f * rows + r
    j, w = divmod(m, wb)
    return c * wb + w, j


def test_pack_bitplanes_blocked_matches_oracle():
    from magicpig_tpu.ops.bitcodes import (pack_bitplanes_blocked,
                                           unpack_words_blocked)
    rng = np.random.default_rng(0)
    S, L, K, blk, fold = 256, 3, 4, 128, 2
    bits = rng.integers(0, 2, size=(2, S, L, K))
    words = np.asarray(pack_bitplanes_blocked(jnp.asarray(bits), blk, fold))
    assert words.shape == (2, L, K, S // 32)
    for t in range(S):
        w, j = _blocked_oracle_word_of_token(t, blk, fold)
        got = (words[1, 2, 1, w] >> j) & 1
        assert got == bits[1, t, 2, 1], t
    # unpack inverts pack
    back = np.asarray(unpack_words_blocked(
        jnp.asarray(words[:, 0, 0]), blk, fold, S))
    np.testing.assert_array_equal(back, bits[:, :, 0, 0].astype(bool))


def test_blocked_flat_equivalence_blk32_fold1():
    """flat layout == blocked layout at blk=32, fold=1."""
    from magicpig_tpu.ops.bitcodes import pack_bitplanes, pack_bitplanes_blocked
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, size=(96, 2, 3)))
    np.testing.assert_array_equal(
        np.asarray(pack_bitplanes(bits)),
        np.asarray(pack_bitplanes_blocked(bits, 32, 1)))


def test_valid_words_blocked():
    from magicpig_tpu.ops.bitcodes import (unpack_words_blocked,
                                           valid_words_blocked)
    S, blk, fold = 256, 128, 2
    lens = jnp.asarray([0, 5, 100, 256], jnp.int32)
    vw = valid_words_blocked(lens, S, blk, fold)
    got = np.asarray(unpack_words_blocked(vw, blk, fold, S))
    want = np.arange(S)[None, :] < np.asarray(lens)[:, None]
    np.testing.assert_array_equal(got, want)


def test_build_planes_blocked_matches_pack():
    from magicpig_tpu.ops.bitcodes import (build_planes_blocked, hash_bits,
                                           pack_bitplanes_blocked)
    rng = np.random.default_rng(2)
    S, H, D, K, L, blk, fold = 512, 2, 16, 3, 4, 256, 2
    keys = jnp.asarray(rng.normal(size=(S, H, D)), jnp.float32)
    proj = jnp.asarray(rng.normal(size=(D, L * K)), jnp.float32)
    bits = hash_bits(keys, proj, K).transpose(1, 0, 2, 3)  # [H, S, L, K]
    want = pack_bitplanes_blocked(bits, blk, fold)
    got = build_planes_blocked(keys, proj, K, blk, fold)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_plane_block():
    from magicpig_tpu.ops.bitcodes import plane_block
    assert plane_block(98304, 2) == 49152
    assert plane_block(12288, 2) == 12288
    assert plane_block(8192, 2) == 8192
    assert plane_block(4096, 1) == 4096
    assert plane_block(2304, 2) == 2304  # no 4096-multiple divides it
    assert plane_block(131072, 2) == 32768
