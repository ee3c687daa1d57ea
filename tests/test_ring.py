"""Ring sequence-parallel prefill vs the single-device causal oracle.

Runs on the virtual 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — the same fabric the TP tests
use; `lax.ppermute` hops are real collectives on it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from magicpig_tpu.ops.attention import flash_prefill
from magicpig_tpu.parallel.ring import ring_prefill


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]).reshape(n), ("seq",))


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
@pytest.mark.parametrize("N,S", [(4, 512), (8, 1024)])
def test_ring_prefill_matches_single_device(layout, N, S):
    rng = np.random.default_rng(0)
    B, HQ, HKV, D = 1, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)

    want = flash_prefill(q, k, v, q_offset=jnp.int32(0),
                         kv_len=jnp.int32(S), block_k=128)
    got = ring_prefill(q, k, v, _mesh(N), block_k=128, layout=layout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_prefill_batch_and_gqa(layout):
    rng = np.random.default_rng(1)
    B, S, HQ, HKV, D = 2, 512, 8, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    want = flash_prefill(q, k, v, q_offset=jnp.int32(0),
                         kv_len=jnp.int32(S), block_k=128)
    got = ring_prefill(q, k, v, _mesh(8), block_k=64, layout=layout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_prefill_pallas_partials(layout):
    """Ring with the Pallas-kernel partials (LSE export through
    `flash_prefill_pallas(return_lse=True)`, interpret mode) must match
    the XLA-partial ring. D=64 / GQA=4: gtq = 4*tq divides 128 at the
    zigzag chunk (512/(2*4) = 64 tokens -> gtq 256) and the contiguous
    shard (128 tokens -> gtq 512)."""
    rng = np.random.default_rng(2)
    B, S, HQ, HKV, D = 1, 512, 8, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    mesh = _mesh(4)
    want = ring_prefill(q, k, v, mesh, block_k=64, layout=layout)
    got = ring_prefill(q, k, v, mesh, block_k=64, layout=layout,
                       use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
