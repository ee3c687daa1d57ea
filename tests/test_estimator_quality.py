"""Statistical quality of the sparse estimators at matched budgets.

The reference's core claim is accuracy ORDER: OracleSampling >= LSH-sampled
> Quest at equal compute (~2-4%), all close to full attention
(README.md:37-45, RULER/Reasoning figures). These tests check that ordering
on a controlled task: queries with planted concentrated keys (attention mass
focused on a few "needles") plus diffuse background — the regime RULER's
niah tasks create.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.ops.attention import (
    full_decode,
    lsh_masked_decode,
)
from magicpig_tpu.ops.baselines import (
    block_topk_decode,
    oracle_sampling_decode,
    quest_decode,
    quest_landmarks,
    topk_decode,
)
from magicpig_tpu.ops.bitcodes import collision_words, hash_bits, unpack_words
from magicpig_tpu.ops.hashing import make_hash_projections

B, HKV, G, S, D = 1, 2, 2, 4096, 64
HQ = HKV * G
N_NEEDLES = 4


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, HQ, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= 8.0
    k = rng.normal(size=(B, HKV, S, D)).astype(np.float32)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    v = rng.normal(size=(B, HKV, S, D)).astype(np.float32)
    # Plant needles: keys strongly aligned with each query head, strong
    # enough that ~99% of softmax mass concentrates on them (score ~12 vs
    # background ~N(0,1): 4 e^12 >> 4096 e^0.5) — the regime where sparse
    # attention must reconstruct the output.
    # Distinct tokens per q-head (same-group heads share the kv cache).
    all_needles = rng.choice(S, size=N_NEEDLES * HQ, replace=False)
    for h in range(HQ):
        kv_h = h // G
        for t in all_needles[h * N_NEEDLES:(h + 1) * N_NEEDLES]:
            direction = q[0, h] / np.linalg.norm(q[0, h])
            k[0, kv_h, t] = 12.0 * direction + 0.05 * k[0, kv_h, t]
    length = jnp.asarray([S], jnp.int32)
    ref, _ = full_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         length)
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), length,
            np.asarray(ref))


def _err(out, ref):
    out = np.asarray(out)
    return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))


def test_lsh_beats_quest_at_matched_budget(planted):
    q, k, v, length, ref = planted
    K, L = 10, 150

    proj = make_hash_projections(jax.random.key(2), D, K, L)
    avg = k.mean(axis=2, keepdims=True)
    kc = k - avg
    knorm = jnp.linalg.norm(kc, axis=-1)
    planes = jax.vmap(
        lambda kb: __import__("magicpig_tpu.ops.bitcodes",
                              fromlist=["build_planes"]).build_planes(
            kb.transpose(1, 0, 2), proj, K))(kc)
    qb = hash_bits(q, proj, K)
    mask = unpack_words(collision_words(qb, planes), S)
    frac = float(mask.mean())
    # q is NOT centered; the estimator centers keys only (reference
    # attnserver.py:144-145) — scores use q . (k - avg): add the avg term
    # back through v-weighting equivalence: full attention over centered
    # keys is a different softmax, so compare against the centered oracle.
    ref_c, _ = full_decode(q, kc, v, length)
    out, _ = lsh_masked_decode(q, kc, v, knorm, mask, length, K, L)
    lsh_err = _err(out, np.asarray(ref_c))

    kmin, kmax = quest_landmarks(k, 16)
    budget_pages = max(int(S * frac) // 16, 1)    # same token budget
    qout, _ = quest_decode(q, k, v, kmin, kmax, length, 16, budget_pages)
    quest_err = _err(qout, ref)

    assert 0.005 < frac < 0.08, frac
    assert lsh_err < 0.15, lsh_err
    # The ordering claim at matched budget.
    assert lsh_err < quest_err + 0.02, (lsh_err, quest_err)


def test_all_estimators_reconstruct_concentrated_attention(planted):
    q, k, v, length, ref = planted
    budget = int(S * 0.04)


    tout, _ = topk_decode(q, k, v, length, budget)
    assert _err(tout, ref) < 0.05

    oout, _ = oracle_sampling_decode(jax.random.key(3), q, k, v, length,
                                     budget)
    assert _err(oout, ref) < 0.35   # with-replacement sampling noise

    # Each kv-head must cover its group's 8 needles, which can land in up
    # to 8 distinct 128-token blocks: budget in blocks, not tokens/128.
    bout, _ = block_topk_decode(q, k, v, length, 128, 12)
    assert _err(bout, ref) < 0.05

    kmin, kmax = quest_landmarks(k, 16)
    qout, _ = quest_decode(q, k, v, kmin, kmax, length, 16, budget // 16)
    assert _err(qout, ref) < 0.15


def test_block_topk_recall_beats_quest_ranking(planted):
    """Exact block scores must rank needle blocks at least as well as
    landmark bounds: with a budget of exactly the needle blocks + slack,
    block_topk's error should not exceed quest's."""
    q, k, v, length, ref = planted
    blocks = 8
    bout, _ = block_topk_decode(q, k, v, length, 128, blocks)
    kmin, kmax = quest_landmarks(k, 128)
    qout, _ = quest_decode(q, k, v, kmin, kmax, length, 128, blocks)
    assert _err(bout, ref) <= _err(qout, ref) + 1e-3
