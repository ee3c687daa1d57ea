"""shard_map execution of the decode-time server ops (production paths).

GSPMD partitions the pure-XLA graph automatically, but `pallas_call` is a
custom call XLA cannot split — under a sharded jit it would be replicated
with full-shape operands (wrong and OOM-prone). These wrappers run the
per-layer decode ops inside `shard_map` over the ("data", "model") mesh, so
every shard executes the REAL kernels (Pallas scorer / block_attend /
fused-LSH / flash-decode) on its local (batch, kv-head) slice — the TPU
equivalent of the reference's per-rank head-sharded servers
(`evaluations/RULER/pred/attnserver_dist.py:252-254,587-589`).

The only cross-shard communication is the workload metric (a pmean); the
attention math itself is embarrassingly parallel over heads, exactly like
the reference's per-rank retrieval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import functools
import inspect

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

# Replication checking renamed check_rep -> check_vma in jax 0.8; either
# way it must be off: pallas_call has no replication rule.
_CHECK_FLAG = ("check_vma" if "check_vma"
               in inspect.signature(_shard_map).parameters else "check_rep")
shard_map = functools.partial(_shard_map, **{_CHECK_FLAG: False})

from magicpig_tpu.config import LSHConfig
from magicpig_tpu.parallel.mesh import state_pspecs
from magicpig_tpu.runtime import server
from magicpig_tpu.runtime.state import DecodeState

_HEADS = P("data", "model", None)   # q / k_new / v_new: [B, H, d]


def decode_dense_layer_sharded(mesh: Mesh, state: DecodeState, di: int,
                               q: jax.Array, k_new: jax.Array,
                               v_new: jax.Array, window: int | None = None,
                               use_pallas: str = "auto"):
    """`server.decode_dense_layer` with each shard running the Pallas
    flash-decode on its local heads/batch."""
    sspecs = state_pspecs(state)

    def body(state, q, k_new, v_new):
        return server.decode_dense_layer(state, di, q, k_new, v_new,
                                         window=window,
                                         use_pallas=use_pallas)

    return shard_map(body, mesh=mesh,
                     in_specs=(sspecs, _HEADS, _HEADS, _HEADS),
                     out_specs=(_HEADS, sspecs))(state, q, k_new, v_new)


def decode_sparse_layer_sharded(mesh: Mesh, state: DecodeState, si: int,
                                q: jax.Array, k_new: jax.Array,
                                v_new: jax.Array, projections: jax.Array,
                                lsh: LSHConfig, window: int | None = None):
    """`server.decode_sparse_layer` sharded over (batch, kv-heads): hash
    projections replicated (shared PRNG replaces the reference's rank-0
    broadcast, `attnserver_dist.py:279`), caches/planes/norms local per
    shard, estimator kernels local, workload metric pmean-reduced."""
    sspecs = state_pspecs(state)

    def body(state, q, k_new, v_new, projections):
        out, st, frac = server.decode_sparse_layer(
            state, si, q, k_new, v_new, projections, lsh, window=window)
        # Every estimator's frac is (covered tokens) / (valid offload
        # tokens) over the LOCAL batch shard; combining shards needs the
        # off_len-weighted mean (ratio of global sums), not a mean of
        # ratios. Heads are symmetric, so a plain pmean over "model".
        w = jnp.maximum(state.off_len.astype(jnp.float32).sum(), 1.0)
        frac = jax.lax.psum(frac * w, "data") / jax.lax.psum(w, "data")
        frac = jax.lax.pmean(frac, "model")
        return out, st, frac

    return shard_map(body, mesh=mesh,
                     in_specs=(sspecs, _HEADS, _HEADS, _HEADS, P()),
                     out_specs=(_HEADS, sspecs, P()))(state, q, k_new, v_new, projections)


def flash_prefill_sharded(mesh: Mesh, q: jax.Array, k: jax.Array,
                          v: jax.Array, length: jax.Array,
                          q_offset: jax.Array | None = None,
                          window: int | None = None,
                          interpret: bool = False) -> jax.Array:
    """`ops.pallas.prefill.flash_prefill_pallas` with each model-axis shard
    running the kernel on its local kv-head group (GQA q heads are laid out
    kv-major, so an Hq split at model_size boundaries keeps each kv head
    with its G query heads — the reference's per-rank head split,
    `llama_dist.py:47-77`). Prefill is per-request, so the batch dim is
    replicated across "data" rather than sharded (same as the GSPMD fill
    path); attention is embarrassingly parallel over heads — no collective.
    """
    from magicpig_tpu.ops.pallas.prefill import flash_prefill_pallas

    heads = P(None, None, "model", None)   # [B, S, H, d]
    if q_offset is None:
        q_offset = jnp.zeros((q.shape[0],), jnp.int32)

    def body(q, k, v, length, q_offset):
        return flash_prefill_pallas(q, k, v, length, q_offset=q_offset,
                                    window=window, interpret=interpret)

    return shard_map(body, mesh=mesh,
                     in_specs=(heads, heads, heads, P(), P()),
                     out_specs=heads)(q, k, v, length, q_offset)
