"""Packed-int4 offload K: layout bijections, packed scorer/attend parity,
and the server-level packed block_topk path (`ops/pack4.py`).

The packed layout halves the block_topk scorer's dominant HBM stream; these
tests pin (a) the pack/unpack and group-layout maps as exact bijections,
(b) the packed Pallas scorer against the unpacked scorer via the token map,
(c) the packed block_attend against the dense block_topk oracle, and
(d) fill+decode through `runtime/server.py` — packed Pallas (interpret)
vs the XLA unpack fallback vs an unpacked-int4 small-block config at full
budget (all attend to every offload token, so layouts cancel).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import LSHConfig, preset
from magicpig_tpu.ops.pack4 import (
    SPAN_TOKENS,
    group_length_mask,
    group_scales,
    group_token_index,
    pack_rows,
    ungroup_scales,
    unpack_rows,
)
from magicpig_tpu.ops.quant import quantize_rows


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for fold in (1, 2):
        rows = 2 * SPAN_TOKENS // fold
        k = jnp.asarray(rng.integers(-7, 8, (3, rows, 128)), jnp.int8)
        packed = pack_rows(k, fold)
        assert packed.shape == (3, rows // 2, 128)
        np.testing.assert_array_equal(np.asarray(unpack_rows(packed, fold)),
                                      np.asarray(k))


def test_group_token_index_is_block_bijection():
    for fold in (1, 2):
        s = 2 * SPAN_TOKENS
        idx = np.asarray(group_token_index(s, fold))
        assert sorted(idx.reshape(-1).tolist()) == list(range(s))
        # Each ranking block's columns map to exactly that block's tokens.
        half = SPAN_TOKENS // fold // 2
        blk0 = idx[:, :half].reshape(-1)
        assert sorted(blk0.tolist()) == list(range(SPAN_TOKENS))


def test_group_scales_inverse():
    rng = np.random.default_rng(1)
    for fold in (1, 2):
        s = 2 * SPAN_TOKENS
        sc = jnp.asarray(rng.standard_normal((2, s)), jnp.float32)
        grp = group_scales(sc, fold)
        assert grp.shape == (2, 2 * fold, s // (2 * fold))
        np.testing.assert_array_equal(np.asarray(ungroup_scales(grp, fold)),
                                      np.asarray(sc))


@pytest.mark.parametrize("D", [64, 128])
def test_packed_scorer_matches_unpacked(D):
    from magicpig_tpu.ops.pallas.score import (
        exact_scores_ranked,
        length_mask,
    )

    rng = np.random.default_rng(2)
    B, HKV, G = 2, 2, 4
    S = 2 * SPAN_TOKENS
    fold = max(128 // D, 1)
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    kq, ks = quantize_rows(k, bits=4)           # [B,HKV,S,D] i8 / [B,HKV,S]
    length = jnp.asarray([S - 200, 700], jnp.int32)

    k_fold = kq.reshape(B, HKV, S // fold, 128)
    ks_fold = ks.reshape(B, HKV, S // fold, fold).transpose(0, 1, 3, 2)
    mask = length_mask(length, S, fold)
    want, want_bm = exact_scores_ranked(q, k_fold, ks_fold, mask,
                                        SPAN_TOKENS, interpret=True)

    k_pk = pack_rows(k_fold, fold)
    ks_grp = group_scales(ks, fold)
    mask_grp = group_length_mask(length, S, fold)
    got, got_bm = exact_scores_ranked(q, k_pk, ks_grp, mask_grp,
                                      SPAN_TOKENS, interpret=True,
                                      packed=True)
    assert got.shape == (B, HKV, 2 * G * fold, S // (2 * fold))

    # Remap both to token order via the layout maps and compare.
    idx_p = np.asarray(group_token_index(S, fold)).reshape(-1)
    got_t = np.full((B, HKV, G, S), np.nan, np.float32)
    got_np = np.asarray(got).reshape(B, HKV, 2 * fold, G, -1)
    for g2 in range(2 * fold):
        cols = got_np.shape[-1]
        toks = idx_p.reshape(2 * fold, cols)[g2]
        got_t[:, :, :, toks] = got_np[:, :, g2]
    want_np = np.asarray(want).reshape(B, HKV, fold, G, S // fold)
    want_t = np.empty_like(got_t)
    for f in range(fold):
        want_t[:, :, :, f::fold] = want_np[:, :, f]
    np.testing.assert_allclose(got_t, want_t, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_bm), np.asarray(want_bm),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("D", [64, 128])
def test_packed_block_attend_matches_oracle(D):
    from magicpig_tpu.ops.baselines import block_topk_decode
    from magicpig_tpu.ops.pallas.block_attend import block_attend
    from magicpig_tpu.ops.pallas.score import (
        exact_scores_ranked,
        length_mask,
    )

    rng = np.random.default_rng(3)
    B, HKV, G, NBP = 1, 2, 4, 3
    S = 4 * SPAN_TOKENS
    fold = max(128 // D, 1)
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    length = jnp.asarray([S - 300], jnp.int32)
    kq, ks = quantize_rows(k, bits=4)
    vq, vs = quantize_rows(v)

    k_pk = pack_rows(kq.reshape(B, HKV, S // fold, 128), fold)
    scores, blk_sc = exact_scores_ranked(
        q, k_pk, group_scales(ks, fold), group_length_mask(length, S, fold),
        SPAN_TOKENS, interpret=True, packed=True)
    _, blk_ids = jax.lax.top_k(blk_sc, NBP)

    v_fold = vq.reshape(B, HKV, S // fold, 128) if fold > 1 else vq
    vs_fold = vs.reshape(B, HKV, S // fold, fold).transpose(0, 1, 3, 2)
    got, got_lse = block_attend(scores, blk_ids, v_fold, vs_fold,
                                SPAN_TOKENS, D, interpret=True, packed=True)

    # Oracle: dense block_topk over the dequantized int4-K / int8-V cache.
    kd = (kq.astype(jnp.float32) * ks[..., None])
    vd = (vq.astype(jnp.float32) * vs[..., None])
    want, want_lse = block_topk_decode(q, kd, vd, length, SPAN_TOKENS, NBP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("packed,D", [(True, 64), (True, 128),
                                      (False, 64), (False, 128)])
def test_rescore_attend_matches_score_store_pipeline(packed, D):
    """block_rank + rescore_attend must reproduce the score-store pipeline
    (exact_scores_ranked + block_attend) for the same selected blocks —
    the dots are bit-identical, so agreement is to float tolerance."""
    from magicpig_tpu.ops.pallas.block_attend import block_attend
    from magicpig_tpu.ops.pallas.rescore_attend import rescore_attend
    from magicpig_tpu.ops.pallas.score import (
        block_rank,
        exact_scores_ranked,
        length_mask,
    )

    rng = np.random.default_rng(7)
    B, HKV, G, NBP = 2, 2, 4, 3
    S = 4 * SPAN_TOKENS
    fold = max(128 // D, 1)
    bits = 4 if packed else 8
    q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    length = jnp.asarray([S - 300, 900], jnp.int32)
    kq, ks = quantize_rows(k, bits=bits)
    vq, vs = quantize_rows(v)
    k_fold = kq.reshape(B, HKV, S // fold, 128)
    v_fold = vq.reshape(B, HKV, S // fold, 128)
    vs_fold = vs.reshape(B, HKV, S // fold, fold).transpose(0, 1, 3, 2)

    if packed:
        k_in = pack_rows(k_fold, fold)
        ks_in = group_scales(ks, fold)
        mask = group_length_mask(length, S, fold)
    else:
        k_in = k_fold
        ks_in = ks.reshape(B, HKV, S // fold, fold).transpose(0, 1, 3, 2)
        mask = length_mask(length, S, fold)

    scores, bm_ref = exact_scores_ranked(q, k_in, ks_in, mask, SPAN_TOKENS,
                                         interpret=True, packed=packed)
    bm = block_rank(q, k_in, ks_in, mask, SPAN_TOKENS, interpret=True,
                    packed=packed)
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(bm_ref))

    _, blk_ids = jax.lax.top_k(bm, NBP)
    want, want_lse = block_attend(scores, blk_ids, v_fold, vs_fold,
                                  SPAN_TOKENS, D, interpret=True,
                                  packed=packed)
    got, got_lse = rescore_attend(q, blk_ids, k_in, ks_in, v_fold, vs_fold,
                                  length, SPAN_TOKENS, D, interpret=True,
                                  packed=packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=2e-3, atol=2e-3)


def _fill_decode(lsh, d, s_cap, use_pallas, k_full, v_full, true_lens,
                 q, k_new, v_new):
    from magicpig_tpu.config import ModelConfig
    from magicpig_tpu.runtime.server import (
        decode_sparse_layer,
        fill_sparse_layer,
    )
    from magicpig_tpu.runtime.state import init_state

    cfg = ModelConfig(name="t", vocab_size=64, hidden_size=d * 2,
                      intermediate_size=64, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=d, dtype=jnp.float32)
    lsh = dataclasses.replace(lsh, use_pallas=use_pallas)
    b = q.shape[0]
    state = init_state(cfg, lsh, b, s_cap)
    proj = jnp.zeros((1,), jnp.float32)
    for r in range(b):
        state = fill_sparse_layer(state, 0, jnp.asarray(r), k_full[r],
                                  v_full[r], true_lens[r], proj, lsh)
    out, state, frac = decode_sparse_layer(state, 0, q, k_new, v_new,
                                           proj, lsh)
    return np.asarray(out)


def test_server_packed_block_topk_paths_agree():
    """fill+decode with packed int4 (Pallas interpret AND the XLA unpack
    fallback) vs unpacked int4 at a different block size, all at full
    block budget — every path attends to all offload tokens, so the
    packed layout must cancel exactly (up to summation order)."""
    rng = np.random.default_rng(4)
    d, hkv, g, b = 64, 2, 2, 2
    max_len = 4 + 16 + 1024 + 4      # off_cap -> 1024 (2 spans)
    p_pad = 1044
    true_lens = [jnp.asarray(1040), jnp.asarray(700)]
    k_full = jnp.asarray(rng.standard_normal((b, p_pad, hkv, d)),
                         jnp.float32)
    v_full = jnp.asarray(rng.standard_normal((b, p_pad, hkv, d)),
                         jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, hkv * g, d)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)

    base = LSHConfig(K=10, L=0, estimator="block_topk",
                     offload_quant="int4", num_sink_tokens=4,
                     num_local_tokens=16, generation_buffer=32,
                     block_topk_budget_frac=1.0, dense_layers=())
    packed = dataclasses.replace(base, block_topk_block_size=SPAN_TOKENS)
    unpacked = dataclasses.replace(base, block_topk_block_size=128)
    assert packed.packed_k4(d) and not unpacked.packed_k4(d)

    args = (d, max_len, k_full, v_full, true_lens, q, k_new, v_new)

    def run(lsh, up):
        return _fill_decode(lsh, args[0], args[1], up, *args[2:])

    o_pallas = run(packed, "on")     # packed rescore pipeline (interpret)
    o_fallback = run(packed, "off")  # packed storage, XLA unpack fallback
    o_ref = run(unpacked, "off")     # unpacked int4, small blocks
    np.testing.assert_allclose(o_pallas, o_fallback, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(o_pallas, o_ref, rtol=2e-3, atol=2e-3)
    # The score-store pipeline knob must agree with rescore (default).
    o_store = run(dataclasses.replace(packed,
                                      block_topk_pipeline="store"), "on")
    np.testing.assert_allclose(o_pallas, o_store, rtol=2e-3, atol=2e-3)
