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

Two layouts:
  * `layout="contiguous"`: device r owns the global slice
    [r*S/N, (r+1)*S/N). With causal masking device r does useful work on
    r+1 of the N steps — utilization ~(N+1)/2N.
  * `layout="zigzag"` (default): device r owns chunks r AND 2N-1-r of
    2N chunks (the ring-flash-attention balance trick): every device
    holds one early and one mirrored late chunk, so per-step causal work
    is uniform across the ring. Fully-masked (future) source chunks are
    skipped with `lax.cond`, so the imbalance saving is real compute,
    not just masking. The wrapper permutes in/out of zigzag order, so
    the op contract (global-order arrays) is unchanged.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np
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
                 block_k: int = 1024, layout: str = "zigzag",
                 use_pallas: bool = False, head_axis: str | None = None,
                 interpret: bool = False) -> jax.Array:
    """Causal self-attention with the sequence sharded over `axis`.

    q: [B, S, Hq, d]; k, v: [B, S, Hkv, d] in GLOBAL token order — S must
    divide by 2x the axis size; RoPE (global positions) is the caller's
    job, as in the engine's prefill. Returns [B, S, Hq, d] in q.dtype,
    sharded like q. `layout`: see module docstring. `use_pallas`: each
    per-step partial runs the whole-prompt Pallas kernel with LSE export
    (`ops/pallas/prefill.py`) instead of the XLA flash scan — shape-gated
    below; a gate failure warns LOUDLY and falls back to the XLA scan.
    `head_axis`: optional second mesh axis sharding the HEAD dims (tensor
    parallelism composed with sequence parallelism — each (seq, model)
    shard rings over its local kv-head group; requires Hq and Hkv to
    divide the axis).
    """
    n = mesh.shape[axis]
    s = q.shape[1]
    if use_pallas:
        d_ = q.shape[3]
        fold = max(128 // d_, 1)
        chunk = s // (2 * n) if layout == "zigzag" else s // n
        hq_local = q.shape[2] // (mesh.shape[head_axis] if head_axis else 1)
        hkv_local = k.shape[2] // (mesh.shape[head_axis] if head_axis else 1)
        tq = min(512, chunk)
        while chunk % tq:
            tq //= 2
        gtq = max(hq_local // max(hkv_local, 1), 1) * tq
        ok = d_ * fold == 128 and chunk % fold == 0 and gtq % 128 == 0
        if not ok:
            warnings.warn(
                f"ring_prefill: Pallas partials requested but shape-gated "
                f"off (d={d_}, fold={fold}, chunk={chunk}, GTq={gtq}); "
                f"falling back to the XLA flash scan", stacklevel=2)
        use_pallas = ok
    assert layout in ("zigzag", "contiguous"), layout
    zig = layout == "zigzag"
    if zig:
        assert s % (2 * n) == 0, (s, n)
        c = s // (2 * n)
        # Chunk-level permutation (a [2n]-gather on the chunk axis — XLA
        # lowers it to slices/concat) instead of a token-level [S]-gather.
        order = np.asarray([x for r in range(n) for x in (r, 2 * n - 1 - r)])

        def chunk_perm(a, idx):
            b_, s_ = a.shape[0], a.shape[1]
            return a.reshape((b_, 2 * n, c) + a.shape[2:])[:, idx].reshape(
                (b_, s_) + a.shape[2:])

        q, k, v = (chunk_perm(a, order) for a in (q, k, v))
    else:
        assert s % n == 0, (s, n)

    def shard_fn(qs, ks, vs):
        nn = jax.lax.axis_size(axis)
        r = jax.lax.axis_index(axis)
        sl = qs.shape[1]
        perm = [(i, (i + 1) % nn) for i in range(nn)]
        b, _, hq, d = qs.shape

        def attend(qc, kc, vc, rel):
            """One contiguous (q-chunk, k-chunk) pair at relative offset
            rel = q_start - k_start; lax.cond skips fully-future sources
            (that's the zigzag balance actually saving compute)."""
            cq = qc.shape[1]

            def live(_):
                if use_pallas:
                    from magicpig_tpu.ops.pallas.prefill import (
                        flash_prefill_pallas,
                    )

                    return flash_prefill_pallas(
                        qc, kc, vc,
                        jnp.full((b,), kc.shape[1], jnp.int32),
                        q_offset=jnp.full((b,), rel, jnp.int32),
                        sm_scale=sm_scale, interpret=interpret,
                        return_lse=True)
                return flash_prefill(
                    qc, kc, vc, q_offset=rel, kv_len=jnp.int32(kc.shape[1]),
                    block_k=min(block_k, kc.shape[1]), sm_scale=sm_scale,
                    return_lse=True)

            def dead(_):
                return (jnp.zeros((b, cq, hq, d), qc.dtype),
                        jnp.full((b, cq, hq), -jnp.inf, jnp.float32))

            o, l = jax.lax.cond(rel + cq > 0, live, dead, None)
            return o.astype(jnp.float32), l

        if zig:
            # Shard = [chunk r ; chunk 2nn-1-r]; global chunk start of the
            # half h on rank x: x*c for h=0, (2*nn-1-x)*c for h=1.
            def start(x, h):
                return jnp.where(h == 0, x * c, (2 * nn - 1 - x) * c)

            def step(t, carry):
                out0, lse0_, out1, lse1_, kb, vb = carry
                src = (r - t) % nn
                outs = [(out0, lse0_), (out1, lse1_)]
                for qi in range(2):
                    o_acc, l_acc = outs[qi]
                    for ki in range(2):
                        rel = start(r, qi) - start(src, ki)
                        o_t, l_t = attend(
                            qs[:, qi * c:(qi + 1) * c],
                            kb[:, ki * c:(ki + 1) * c],
                            vb[:, ki * c:(ki + 1) * c], rel)
                        o_acc, l_acc = _merge(o_acc, l_acc, o_t, l_t)
                    outs[qi] = (o_acc, l_acc)
                kb = jax.lax.ppermute(kb, axis, perm)
                vb = jax.lax.ppermute(vb, axis, perm)
                return (*outs[0], *outs[1], kb, vb)

            z = jnp.zeros((b, c, hq, d), jnp.float32)
            ninf = jnp.full((b, c, hq), -jnp.inf, jnp.float32)
            out0, _, out1, _, _, _ = jax.lax.fori_loop(
                0, nn, step, (z, ninf, z, ninf, ks, vs))
            return jnp.concatenate([out0, out1], axis=1).astype(qs.dtype)

        def step(t, carry):
            out, lse, kb, vb = carry
            src = (r - t) % nn         # global owner of the resident shard
            o_t, l_t = attend(qs, kb, vb, (r - src) * sl)
            out, lse = _merge(out, lse, o_t, l_t)
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return out, lse, kb, vb

        out0 = jnp.zeros((b, sl, hq, d), jnp.float32)
        lse0 = jnp.full((b, sl, hq), -jnp.inf, jnp.float32)
        out, _, _, _ = jax.lax.fori_loop(0, nn, step, (out0, lse0, ks, vs))
        return out.astype(qs.dtype)

    spec = P(None, axis, head_axis, None)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    out = fn(q, k, v)
    if zig:
        inv_order = np.argsort(order)
        out = chunk_perm(out, inv_order)
    return out
