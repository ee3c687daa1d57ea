"""Ring sequence-parallel causal prefill attention.

The reference has no sequence parallelism (its prefill is single-GPU per
rank, `models/llama.py:263-285`); on TPU the prefill of contexts that
exceed one chip's HBM (8B @ 96K: BENCHMARKS.md capacity table) wants the
SEQUENCE sharded over the mesh. This is the standard ring-attention
formulation mapped to ICI:

  * q/k/v arrive sharded [B, S/N, H, d] on a mesh axis (each device owns
    the contiguous global slice [r*S/N, (r+1)*S/N));
  * N ring steps: each device attends its resident queries against the
    K/V shard currently held, then rotates the K/V shard one hop with
    `lax.ppermute` (neighbor traffic only — rides ICI, never DCN);
  * per-step partials are (out, lse) from `flash_prefill(return_lse=True)`
    with the global causal offset folded into q_offset — future shards
    mask to (0, -inf) and merge as no-ops;
  * partials combine with the same LSE merge the decode path uses
    (`ops/merge.py` math, inlined here for the [B, Sq, Hq] layout).

Plain ring (not zigzag/striped): with causal masking device r does useful
work on r+1 of the N steps, so utilization is ~(N+1)/2N — the standard
first-order ring; a striped layout is a layout-level upgrade that does
not change this op's contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from magicpig_tpu.ops.attention import flash_prefill
from magicpig_tpu.parallel.sharded import shard_map


def _merge(o1, l1, o2, l2):
    """LSE-merge two normalized partials; o [B,Sq,Hq,d] f32, l [B,Sq,Hq]."""
    m = jnp.maximum(l1, l2)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w1 = jnp.where(jnp.isneginf(l1), 0.0, jnp.exp(l1 - m_safe))
    w2 = jnp.where(jnp.isneginf(l2), 0.0, jnp.exp(l2 - m_safe))
    tot = w1 + w2
    safe = jnp.where(tot > 0, tot, 1.0)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / safe[..., None]
    lse = jnp.where(tot > 0, m_safe + jnp.log(safe), -jnp.inf)
    return o, lse


def ring_prefill(q: jax.Array, k: jax.Array, v: jax.Array, mesh,
                 axis: str = "seq", sm_scale: float | None = None,
                 block_k: int = 1024) -> jax.Array:
    """Causal self-attention with the sequence sharded over `axis`.

    q: [B, S, Hq, d]; k, v: [B, S, Hkv, d] — S must divide by the axis
    size; RoPE (global positions) is the caller's job, as in the engine's
    prefill. Returns [B, S, Hq, d] in q.dtype, sharded like q.
    """
    def shard_fn(qs, ks, vs):
        n = jax.lax.axis_size(axis)
        r = jax.lax.axis_index(axis)
        sl = qs.shape[1]
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(t, carry):
            out, lse, kb, vb = carry
            src = (r - t) % n          # global owner of the resident shard
            o_t, l_t = flash_prefill(
                qs, kb, vb, q_offset=(r - src) * sl, kv_len=jnp.int32(sl),
                block_k=min(block_k, sl), sm_scale=sm_scale,
                return_lse=True)
            out, lse = _merge(out, lse, o_t.astype(jnp.float32), l_t)
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return out, lse, kb, vb

        b, _, hq, d = qs.shape
        out0 = jnp.zeros((b, sl, hq, d), jnp.float32)
        lse0 = jnp.full((b, sl, hq), -jnp.inf, jnp.float32)
        out, _, _, _ = jax.lax.fori_loop(0, n, step, (out0, lse0, ks, vs))
        return out.astype(qs.dtype)

    spec = P(None, axis, None, None)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    return fn(q, k, v)
