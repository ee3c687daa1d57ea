"""The LLM engine: prefill / inference / generate / clear.

API-equivalent of the reference `LLM` (`models/llama.py:64-365`) redesigned
around jitted pure functions:
  * `prefill` runs layer-by-layer over the whole (padded) prompt with
    statically-chunked flash attention and a scan-chunked MLP (the
    reference's 8192-token chunk pipeline, `models/llama.py:222-286`),
    filling the attention-server state per layer.
  * `inference` is ONE jitted decode step over all layers (dense and sparse
    paths chosen statically per layer), with the state donated so cache
    updates are in-place in HBM.
  * `generate` samples on-device (top-p/greedy) and only syncs a scalar
    token per step for the EOS check, like the reference's loop
    (`models/llama.py:327-360`).

LSH hash projections come from a replicated PRNG key — the TPU replacement
for the reference's rank-0 broadcast of `hash_func`
(`attnserver_dist.py:279`).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from magicpig_tpu.config import LSHConfig, ModelConfig, preset
from magicpig_tpu.models.llama import (
    LlamaParams,
    init_params,
    post_attention,
    qkv_proj,
    unembed,
)
from magicpig_tpu.ops.attention import flash_prefill
from magicpig_tpu.ops.pallas.prefill import flash_prefill_pallas
from magicpig_tpu.ops.hashing import make_hash_projections
from magicpig_tpu.ops.sampling import greedy_sample, top_p_sample
from magicpig_tpu.runtime import state as state_lib
from magicpig_tpu.runtime.server import (
    _interp,
    _use_pallas,
    decode_dense_layer,
    decode_sparse_layer,
    fill_dense_layer,
    fill_sparse_layer,
)


class LLM:
    """LSH-sampled decoding engine (reference `LLM`, `models/llama.py:64`)."""

    def __init__(self, model: str | ModelConfig = "llama-tiny", K: int = 10,
                 L: int = 150, batch_size: int = 1, max_length: int = 8192,
                 generation_buffer: int = 256, chunk_size: int = 8192,
                 params: LlamaParams | None = None, seed: int = 0,
                 lsh: LSHConfig | None = None):
        self.config = preset(model) if isinstance(model, str) else model
        if lsh is None:
            # Reference server selection by K sign: K>0 → LSH sampling,
            # K==0 → full attention, K<0 → Quest baseline
            # (`evaluations/RULER/pred/llama_dist.py:122-133`).
            estimator = "quest" if K < 0 else "lsh"
            lsh = LSHConfig(K=abs(K), L=L, estimator=estimator,
                            generation_buffer=generation_buffer)
        self.lsh = lsh
        self.batch_size = batch_size
        self.max_length = max_length
        self.chunk_size = chunk_size
        self.groups = state_lib.layer_groups(self.config, self.lsh)
        if self.config.sliding_window is not None and self.lsh.enabled:
            # Local/generated hot tokens must always be inside the window
            # (only sink tokens age out; see decode_sparse_layer).
            assert self.config.sliding_window > state_lib.hot_capacity(self.lsh), (
                "sliding_window must exceed sink+local+generation_buffer")

        key = jax.random.key(seed)
        pkey, hkey, self._sample_key = jax.random.split(key, 3)
        self.params = params if params is not None else init_params(
            self.config, pkey, max_length)
        self.projections = make_hash_projections(
            hkey, self.config.head_dim, max(self.lsh.K, 1), max(self.lsh.L, 1))
        self.state = state_lib.init_state(
            self.config, self.lsh, batch_size, max_length)

        self._decode_jit = jax.jit(self._decode_fn, donate_argnums=(1,))
        self._decode_scan_jit = jax.jit(
            self._decode_scan_fn, donate_argnums=(1,),
            static_argnames=("n_steps",))
        self._prefill_jit = jax.jit(
            self._prefill_fn, donate_argnums=(1,), static_argnames=("p_pad",))
        self._sample_jit = jax.jit(
            self._sample_fn, static_argnames=("temperature", "top_p"))
        # Observability: mean sampled fraction over decode steps (the
        # reference's "Avg Sparsity", `xllm_gen.py:184-190`).
        self._sparsity_sum = 0.0
        self._sparsity_steps = 0
        # Host mirrors of per-slot cache usage for the generation-buffer
        # guard: the reference sizes its paged cache for M + buffer
        # (`models/attnserver.py:16,25`); past capacity our
        # `dynamic_update_slice` append would silently clamp and corrupt the
        # last cache row, so decode entry fails loudly instead.
        self._hot_used: dict[int, int] = {}   # slot -> hot tokens used
        self._pos_used: dict[int, int] = {}   # slot -> absolute position

    # -- pure functions (jitted in __init__) --------------------------------

    def _pallas_prefill(self) -> bool:
        """Prefill attention through the Pallas flash kernel: on TPU (or
        use_pallas="on" in interpret mode). Sharded engines route through
        `parallel.sharded.flash_prefill_sharded` — GSPMD cannot partition a
        pallas_call, so the kernel runs per model-axis shard on its local
        kv-head group (requires Hkv % model_size == 0, which
        `shard_engine` already enforces for the cache shards)."""
        import os

        cfg = self.config
        if os.environ.get("MAGICPIG_NO_PALLAS_PREFILL"):
            # Surgical kill-switch: fall back to the XLA prefill scan
            # without disabling the (independently verified) decode
            # kernels, e.g. if a toolchain rev mis-lowers only this kernel.
            return False
        mesh = getattr(self, "mesh", None)
        if (mesh is not None
                and cfg.num_key_value_heads % mesh.shape.get("model", 1)):
            return False
        if 128 % cfg.head_dim:
            return False
        # The kernel's token-folded K/V requires every KV buffer length it
        # sees to divide by fold: p_pad (a chunk_size multiple) in the
        # one-shot path, max_length (the staging buffer) in the staged one.
        fold = 128 // cfg.head_dim
        if self.chunk_size % fold or self.max_length % fold:
            return False
        return _use_pallas(self.lsh, cfg.head_dim)

    def _prefill_attn(self, q, k, v, length, q_offset=None):
        """Dispatch one prefill-attention call to the Pallas kernel —
        directly on a single device, through shard_map under a mesh."""
        cfg = self.config
        mesh = getattr(self, "mesh", None)
        if mesh is None:
            return flash_prefill_pallas(
                q, k, v, length, q_offset=q_offset,
                window=cfg.sliding_window, interpret=_interp())
        from magicpig_tpu.parallel.sharded import flash_prefill_sharded

        return flash_prefill_sharded(
            mesh, q, k, v, length, q_offset=q_offset,
            window=cfg.sliding_window, interpret=_interp())

    def _ring_prefill_on(self, p_pad: int) -> bool:
        """Sequence-parallel ring prefill: active when the engine was
        sharded with a `seq_axis` (`shard_engine(..., seq_axis=...)`) and
        the padded prompt divides into 2x axis-size zigzag chunks. A gate
        failure warns loudly — seq-parallelism silently not happening is a
        capacity surprise at 96K."""
        mesh = getattr(self, "mesh", None)
        seq_axis = getattr(self, "seq_axis", None)
        if mesh is None or not seq_axis:
            return False
        n = mesh.shape[seq_axis]
        if n <= 1:
            return False
        if p_pad % (2 * n):
            import warnings

            warnings.warn(
                f"seq-parallel prefill requested but p_pad={p_pad} does not "
                f"divide 2*{n} zigzag chunks; falling back to single-shard "
                f"prefill", stacklevel=3)
            return False
        return True

    def _prefill_fn(self, params: LlamaParams, state, tokens, true_len, req,
                    *, p_pad: int):
        cfg, lsh = self.config, self.lsh
        c = min(self.chunk_size, p_pad)
        n_chunks = p_pad // c
        hidden = params.embed[tokens][None]                  # [1, P, h]
        positions = jnp.arange(p_pad, dtype=jnp.int32)[None]
        mesh = getattr(self, "mesh", None)
        ring_on = self._ring_prefill_on(p_pad)
        if ring_on:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from magicpig_tpu.parallel.ring import ring_prefill

            seq_axis = self.seq_axis
            head_axis = ("model" if mesh.shape.get("model", 1) > 1 else None)
            # Shard the token axis so every layer's activation transients
            # (hidden, q/k/v, MLP) split over the seq axis — the capacity
            # win that motivates seq-parallel prefill past one chip.
            hidden = jax.lax.with_sharding_constraint(
                hidden, NamedSharding(mesh, P(None, seq_axis, None)))

        # Attention in 1024-query sub-chunks under lax.scan: bounds the
        # softmax transient to [Hkv, G, sub, sub] (a block_k == chunk_size
        # einsum materialized ~8.6 GB per 8192-token chunk at 96K) and
        # keeps the traced graph one sub-chunk per layer. The causal
        # triangle is preserved by flash_prefill's dynamic KV-block bound.
        sub = c if c < 1024 or c % 1024 else 1024
        n_sub = p_pad // sub

        def attn_scan(q, k, v):  # q [1,P,Hq,d]; k/v [1,P,Hkv,d]
            if ring_on:
                o = ring_prefill(
                    q, k, v, mesh, axis=seq_axis, head_axis=head_axis,
                    block_k=min(1024, p_pad),
                    use_pallas=self._pallas_prefill(), interpret=_interp())
                return o.reshape(1, p_pad, -1)               # [1, P, Hq*d]
            if self._pallas_prefill():
                # Whole-prompt Pallas flash kernel: the XLA scan below
                # round-trips ~134 MB of score/probability intermediates
                # through HBM per KV block (measured 2.9 s/layer at 96K,
                # ~10x the MXU floor); the kernel keeps them in VMEM.
                o = self._prefill_attn(
                    q, k, v, jnp.full((1,), true_len, jnp.int32))
                return o.reshape(1, p_pad, -1)               # [1, P, Hq*d]
            qs = q.reshape(1, n_sub, sub, q.shape[2], q.shape[3])
            qs = qs.transpose(1, 0, 2, 3, 4)
            offs = jnp.arange(n_sub, dtype=jnp.int32) * sub

            def body(_, xs):
                qj, off = xs
                o = flash_prefill(qj, k, v, off, off + sub, block_k=sub,
                                  window=cfg.sliding_window)
                return None, o

            _, outs = jax.lax.scan(body, None, (qs, offs))
            outs = outs.transpose(1, 0, 2, 3, 4)
            return outs.reshape(1, p_pad, -1)                # [1, P, Hq*d]

        for i, (kind, gi) in enumerate(self.groups):
            lp = params.layers.layer(i)
            q, k, v = qkv_proj(lp, cfg, hidden, positions, params.cos, params.sin)
            attn = attn_scan(q, k, v)                        # [1, P, Hq*d]

            # o_proj + MLP, scan-chunked to bound the [c, inter] transient.
            def mlp_chunk(_, xs):
                a, r = xs
                return None, post_attention(lp, cfg, a, r)
            _, hidden = jax.lax.scan(
                mlp_chunk, None,
                (attn.reshape(n_chunks, 1, c, -1),
                 hidden.reshape(n_chunks, 1, c, -1)))
            hidden = hidden.reshape(1, p_pad, -1)

            if kind == "dense":
                state = fill_dense_layer(state, gi, req, k[0], v[0], true_len)
            else:
                state = fill_sparse_layer(state, gi, req, k[0], v[0],
                                          true_len, self.projections, lsh,
                                          window=cfg.sliding_window)

        last = jax.lax.dynamic_slice(hidden, (0, true_len - 1, 0),
                                     (1, 1, hidden.shape[-1]))[:, 0]
        logits = unembed(params, cfg, last)                  # [1, V]
        state = state.replace(pos=state.pos.at[req].set(true_len))
        return state, logits

    def _decode_fn(self, params: LlamaParams, state, tokens):
        cfg, lsh = self.config, self.lsh
        # On a sharded engine (shard_engine) the attention ops run under
        # shard_map so the Pallas kernels execute per (data, model) shard;
        # GSPMD alone cannot partition a pallas_call (parallel/sharded.py).
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from magicpig_tpu.parallel.sharded import (
                decode_dense_layer_sharded,
                decode_sparse_layer_sharded,
            )
        b = tokens.shape[0]
        hidden = params.embed[tokens]                        # [B, h]
        positions = state.pos
        frac_sum = jnp.float32(0.0)
        n_sparse = 0
        for i, (kind, gi) in enumerate(self.groups):
            lp = params.layers.layer(i)
            q, k, v = qkv_proj(lp, cfg, hidden[:, None], positions[:, None],
                               params.cos, params.sin)
            q, k, v = q[:, 0], k[:, 0], v[:, 0]              # [B,H,d]
            if kind == "dense":
                if mesh is not None:
                    out, state = decode_dense_layer_sharded(
                        mesh, state, gi, q, k, v, window=cfg.sliding_window,
                        use_pallas=lsh.use_pallas)
                else:
                    out, state = decode_dense_layer(
                        state, gi, q, k, v, window=cfg.sliding_window,
                        use_pallas=lsh.use_pallas)
            else:
                if mesh is not None:
                    out, state, frac = decode_sparse_layer_sharded(
                        mesh, state, gi, q, k, v, self.projections, lsh,
                        window=cfg.sliding_window)
                else:
                    out, state, frac = decode_sparse_layer(
                        state, gi, q, k, v, self.projections, lsh,
                        window=cfg.sliding_window)
                frac_sum = frac_sum + frac
                n_sparse += 1
            hidden = post_attention(
                lp, cfg, out.reshape(b, 1, -1), hidden[:, None])[:, 0]
        logits = unembed(params, cfg, hidden)                # [B, V]
        state = state.replace(
            pos=state.pos + 1,
            dense_len=state.dense_len + 1,
            hot_len=state.hot_len + 1,
            step=state.step + 1,
        )
        return state, logits, frac_sum / max(n_sparse, 1)

    def _decode_scan_fn(self, params: LlamaParams, state, tokens, *,
                        n_steps: int):
        """Run `n_steps` greedy decode steps in ONE dispatch (lax.scan over
        steps). The reference must round-trip to the host per token; on TPU
        on-device sampling lets the whole decode loop stay resident, which
        also amortizes dispatch overhead in benchmarks."""
        def step(carry, _):
            state, toks = carry
            state, logits, frac = self._decode_fn(params, state, toks)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (state, nxt), (nxt, frac)
        (state, _), (toks, fracs) = jax.lax.scan(
            step, (state, tokens), None, length=n_steps)
        return state, toks, jnp.mean(fracs)

    def _guard_decode(self, n_steps: int):
        """Fail loudly if `n_steps` more decode tokens would overflow any
        live slot's generation buffer or the dense cache (reference cache
        sizing `models/attnserver.py:16,25`)."""
        hot_cap = state_lib.hot_capacity(self.lsh)
        for slot, used in self._hot_used.items():
            if self.lsh.enabled and used + n_steps > hot_cap:
                raise ValueError(
                    f"slot {slot}: {n_steps} more decode steps would use "
                    f"{used + n_steps} hot tokens > generation-buffer "
                    f"capacity {hot_cap}; raise LSHConfig.generation_buffer")
            if self._pos_used.get(slot, 0) + n_steps > self.max_length:
                raise ValueError(
                    f"slot {slot}: position {self._pos_used[slot] + n_steps} "
                    f"would exceed max_length {self.max_length}")
        for slot in self._hot_used:
            self._hot_used[slot] += n_steps
            self._pos_used[slot] += n_steps

    def release_slot(self, slot: int):
        """Free one request slot (lengths zeroed; mirrors dropped) so a new
        prefill can reuse it — used by the continuous-batching scheduler."""
        st = self.state
        self.state = st.replace(
            pos=st.pos.at[slot].set(0),
            dense_len=st.dense_len.at[slot].set(0),
            hot_len=st.hot_len.at[slot].set(0),
            off_len=st.off_len.at[slot].set(0),
        )
        self._hot_used.pop(slot, None)
        self._pos_used.pop(slot, None)

    def decode_steps(self, input_ids, n_steps: int):
        """Greedy-decode n_steps tokens in one dispatch; returns [n_steps, B]."""
        self._guard_decode(n_steps)
        tokens = jnp.asarray(np.asarray(input_ids, np.int32).reshape(-1))
        self.state, toks, frac = self._decode_scan_jit(
            self.params, self.state, tokens, n_steps=n_steps)
        if self.lsh.enabled:
            self._sparsity_sum += float(frac) * n_steps
            self._sparsity_steps += n_steps
        return toks

    @staticmethod
    def _sample_fn(key, logits, *, temperature: float, top_p: float):
        if temperature < 0.1:
            return greedy_sample(logits)
        return top_p_sample(key, logits, temperature, top_p)

    # -- public API ----------------------------------------------------------

    def prefill(self, input_ids, request_id: int = 0):
        """Prefill one request into slot `request_id`; returns logits [1, V]."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        p = len(ids)
        assert p >= self.lsh.num_sink_tokens + self.lsh.num_local_tokens + 1, (
            "prompt shorter than sink+local tokens")
        assert p <= self.max_length
        c = min(self.chunk_size, self.max_length)
        p_pad = ((p + c - 1) // c) * c
        tokens = np.zeros((p_pad,), np.int32)
        tokens[:p] = ids
        self.state, logits = self._prefill_jit(
            self.params, self.state, jnp.asarray(tokens), jnp.int32(p),
            jnp.int32(request_id), p_pad=p_pad)
        self._hot_used[request_id] = (self.lsh.num_sink_tokens
                                      + self.lsh.num_local_tokens)
        self._pos_used[request_id] = p
        return logits

    def _prefill_chunk_fn(self, params: LlamaParams, stage_k, stage_v,
                          tokens_c, true_len, idx, *, c: int):
        """One chunk of a STAGED prefill: run chunk `idx` ([c] tokens)
        through all layers, attending over this request's staged K/V prefix,
        append the chunk's per-layer K/V into the staging buffers, and
        return logits at the last valid position seen so far.

        Same math as `_prefill_fn` (same 1024-query sub-chunking, same
        block_k), just one chunk per dispatch — the interleaved admission
        path (`runtime/serving.py`) alternates these with decode steps so a
        long prompt stalls live decodes by chunk_size tokens, not the whole
        prompt. The estimator state build (centering, signatures,
        landmarks) needs the COMPLETED prompt keys, so fills happen once at
        the end from staging (`_fill_from_staging_fn`).
        """
        cfg = self.config
        off = idx * c
        hidden = params.embed[tokens_c][None]                # [1, c, h]
        positions = (off + jnp.arange(c, dtype=jnp.int32))[None]
        sub = c if c < 1024 or c % 1024 else 1024
        n_sub = c // sub

        def attn_scan(q, sk, sv):  # q [1,c,Hq,d]; sk/sv [S,Hkv,d]
            if self._pallas_prefill():
                o = self._prefill_attn(
                    q, sk[None], sv[None],
                    jnp.full((1,), off + c, jnp.int32),
                    q_offset=jnp.full((1,), off, jnp.int32))
                return o.reshape(1, c, -1)                   # [1, c, Hq*d]
            hq, d = q.shape[2], q.shape[3]
            qs = q.reshape(1, n_sub, sub, hq, d).transpose(1, 0, 2, 3, 4)
            offs = off + jnp.arange(n_sub, dtype=jnp.int32) * sub

            def body(_, xs):
                qj, o = xs
                out = flash_prefill(qj, sk[None], sv[None], o, o + sub,
                                    block_k=sub, window=cfg.sliding_window)
                return None, out

            _, outs = jax.lax.scan(body, None, (qs, offs))
            outs = outs.transpose(1, 0, 2, 3, 4)
            return outs.reshape(1, c, -1)                    # [1, c, Hq*d]

        for i in range(len(self.groups)):
            lp = params.layers.layer(i)
            q, k, v = qkv_proj(lp, cfg, hidden, positions, params.cos,
                               params.sin)
            stage_k = jax.lax.dynamic_update_slice(
                stage_k, k.astype(stage_k.dtype), (i, off, 0, 0))
            stage_v = jax.lax.dynamic_update_slice(
                stage_v, v.astype(stage_v.dtype), (i, off, 0, 0))
            attn = attn_scan(q, stage_k[i], stage_v[i])
            hidden = post_attention(lp, cfg, attn, hidden)

        last_ix = jnp.clip(true_len - 1 - off, 0, c - 1)
        last = jax.lax.dynamic_slice(hidden, (0, last_ix, 0),
                                     (1, 1, hidden.shape[-1]))[:, 0]
        logits = unembed(params, cfg, last)                  # [1, V]
        return stage_k, stage_v, logits

    def _fill_from_staging_fn(self, state, stage_k, stage_v, true_len, req):
        """Estimator state build from fully-staged prompt K/V — the tail of
        `_prefill_fn`, split out so the interleaved path runs it once after
        the last chunk."""
        cfg, lsh = self.config, self.lsh
        for i, (kind, gi) in enumerate(self.groups):
            if kind == "dense":
                state = fill_dense_layer(state, gi, req, stage_k[i],
                                         stage_v[i], true_len)
            else:
                state = fill_sparse_layer(state, gi, req, stage_k[i],
                                          stage_v[i], true_len,
                                          self.projections, lsh,
                                          window=cfg.sliding_window)
        return state.replace(pos=state.pos.at[req].set(true_len))

    def start_prefill(self, input_ids, request_id: int = 0):
        """Begin a chunked prefill of one request; returns a
        `ChunkedPrefill` whose `.step()` processes one chunk per call and
        yields the first-token logits after the final chunk + fill.

        Costs one staging buffer pair [L, max_length, Hkv, d] in the
        compute dtype (~2*L*S*Hkv*d bytes — one extra request's worth of
        K/V), shared across requests: only ONE prefill may be in flight at
        a time.
        """
        if getattr(self, "_stage_k", None) is None:
            cfg = self.config
            shape = (len(self.groups), self.max_length,
                     cfg.num_key_value_heads, cfg.head_dim)
            self._stage_k = jnp.zeros(shape, cfg.dtype)
            self._stage_v = jnp.zeros(shape, cfg.dtype)
            self._prefill_chunk_jit = jax.jit(
                self._prefill_chunk_fn, donate_argnums=(1, 2),
                static_argnames=("c",))
            self._fill_staging_jit = jax.jit(
                self._fill_from_staging_fn, donate_argnums=(0,))
        return ChunkedPrefill(self, input_ids, request_id)

    def inference(self, input_ids):
        """One decode step for the whole batch; returns logits [B, V]."""
        self._guard_decode(1)
        tokens = jnp.asarray(np.asarray(input_ids, np.int32).reshape(-1))
        self.state, logits, frac = self._decode_jit(
            self.params, self.state, tokens)
        if self.lsh.enabled:
            self._sparsity_sum += float(frac)
            self._sparsity_steps += 1
        return logits

    @property
    def avg_sparsity(self) -> float:
        """Mean sampled fraction over ALL decode steps since engine creation
        (reference "Avg Sparsity", `evaluations/RULER/pred/xllm_gen.py:
        184-190`; lifetime-cumulative so eval drivers can read it after
        `generate()`'s implicit `clear()`)."""
        return self._sparsity_sum / max(self._sparsity_steps, 1)

    def sparsity_snapshot(self) -> tuple[float, int]:
        """Snapshot of the sparsity accumulators; pass to
        `avg_sparsity_since` to get a per-run (e.g. per-RULER-task) average
        like the reference's per-run report (`xllm_gen.py:184-190`)."""
        return (self._sparsity_sum, self._sparsity_steps)

    def avg_sparsity_since(self, snapshot: tuple[float, int]) -> float:
        s0, n0 = snapshot
        return ((self._sparsity_sum - s0)
                / max(self._sparsity_steps - n0, 1))

    def generate(self, input_ids, max_tokens: int = 128,
                 temperature: float = 0.6, top_p: float = 0.9,
                 verbose: bool = False):
        """Prefill + decode loop with on-device sampling; returns token list
        (reference `models/llama.py:327-360`)."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        hot_cap = state_lib.hot_capacity(self.lsh)
        base = self.lsh.num_sink_tokens + self.lsh.num_local_tokens
        if self.lsh.enabled and base + max_tokens > hot_cap:
            raise ValueError(
                f"max_tokens={max_tokens} exceeds the generation buffer "
                f"({hot_cap - base} tokens); raise "
                f"LSHConfig.generation_buffer")
        logits = self.prefill(ids, request_id=0)
        jax.block_until_ready(logits)
        t1 = time.perf_counter()
        generated: list[int] = []
        key = self._sample_key
        if temperature < 0.1 and self.batch_size == 1:
            # Greedy fast path: decode in multi-token chunks via the
            # scanned one-dispatch step — the per-token loop below pays
            # TWO host round-trips per token (~60 ms through the axon
            # tunnel), which dominated the RULER predict wall time.
            # Tokens computed past an EOS inside a chunk are discarded
            # (the per-sample clear() resets state anyway).
            tok = int(np.asarray(greedy_sample(logits))[0])
            generated.append(tok)
            while (len(generated) < max_tokens
                   and tok not in self.config.eos_token_ids):
                # Fixed chunk size: every distinct n_steps is a separate
                # decode-scan compile; overshooting the tail and trimming
                # costs a few wasted steps instead of a fresh executable.
                try:
                    chunk = np.asarray(self.decode_steps([tok], 16))[:, 0]
                except ValueError:   # generation buffer can't fit 16 more
                    chunk = np.asarray(self.decode_steps(
                        [tok], max_tokens - len(generated)))[:, 0]
                for t in chunk:
                    tok = int(t)
                    generated.append(tok)
                    if (tok in self.config.eos_token_ids
                            or len(generated) >= max_tokens):
                        break
        else:
            for _ in range(max_tokens):
                key, sub = jax.random.split(key)
                token = self._sample_jit(sub, logits,
                                         temperature=temperature,
                                         top_p=top_p)
                tok = int(np.asarray(token)[0])
                generated.append(tok)
                if tok in self.config.eos_token_ids:
                    break
                logits = self.inference(token)
        t2 = time.perf_counter()
        if verbose:
            n = len(generated)
            print(f"[INFO] Prefill {len(ids)} tokens")
            print(f"[INFO] Generate {n} tokens")
            print(f"[INFO] Decoding Latency {1000 * (t2 - t1) / max(n,1):.2f} ms/token")
        self.clear()
        return generated

    def clear(self):
        """Reset all server state (reference `clear`, `attnserver.py:314`).
        The sparsity counters survive (lifetime metric, see avg_sparsity)."""
        self.state = state_lib.init_state(
            self.config, self.lsh, self.batch_size, self.max_length)
        self._hot_used.clear()
        self._pos_used.clear()


class ChunkedPrefill:
    """In-flight chunked prefill of one request (`LLM.start_prefill`).

    `step()` processes the next prompt chunk (one jitted dispatch of
    `_prefill_chunk_fn`); after the final chunk it runs the estimator
    state build from staging and returns the first-token logits [1, V]
    (None until then). Callers interleave `step()` with decode steps —
    see `runtime/serving.py::Scheduler(interleave=True)`.
    """

    def __init__(self, llm: LLM, input_ids, request_id: int):
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        p = len(ids)
        assert p >= llm.lsh.num_sink_tokens + llm.lsh.num_local_tokens + 1, (
            "prompt shorter than sink+local tokens")
        assert p <= llm.max_length
        self.llm = llm
        self.request_id = request_id
        self.true_len = p
        self.c = min(llm.chunk_size, llm.max_length)
        self.n_chunks = (p + self.c - 1) // self.c
        toks = np.zeros((self.n_chunks * self.c,), np.int32)
        toks[:p] = ids
        self._tokens = toks
        self._idx = 0
        self.logits = None

    @property
    def done(self) -> bool:
        return self.logits is not None

    def step(self):
        """One chunk of prefill work; returns logits after the last chunk."""
        assert not self.done
        llm, i, c = self.llm, self._idx, self.c
        chunk = jnp.asarray(self._tokens[i * c:(i + 1) * c])
        llm._stage_k, llm._stage_v, logits = llm._prefill_chunk_jit(
            llm.params, llm._stage_k, llm._stage_v, chunk,
            jnp.int32(self.true_len), jnp.int32(i), c=c)
        self._idx += 1
        if self._idx < self.n_chunks:
            return None
        llm.state = llm._fill_staging_jit(
            llm.state, llm._stage_k, llm._stage_v, jnp.int32(self.true_len),
            jnp.int32(self.request_id))
        llm._hot_used[self.request_id] = (llm.lsh.num_sink_tokens
                                          + llm.lsh.num_local_tokens)
        llm._pos_used[self.request_id] = self.true_len
        self.logits = logits
        return logits
