"""Model and LSH configuration.

Mirrors the knobs of the reference system (MagicPIG):
  * LSH parameters K (bits per table) and L (number of tables)
    — reference `models/attnserver.py:9-20`.
  * Attention-cache partition: 4 sink tokens + 64 local tokens + a
    generation buffer — reference `models/attnserver.py:14-16,25`.
  * Dense layers (full attention, no sampling): default [0, 16, 32, 48, 64]
    — reference `models/attnserver.py:18`.
  * Chunked prefill size 8192 — reference `models/llama.py:100`.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Llama-3 style RoPE frequency scaling (HF `rope_scaling` dict)."""

    rope_type: str = "default"  # "default" | "llama3"
    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family transformer shape (equivalent of HF LlamaConfig fields the
    reference reads — `models/llama.py:78-90`)."""

    name: str = "llama-tiny"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: RopeScaling | None = None
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = False
    eos_token_ids: tuple[int, ...] = (128001, 128008, 128009)
    dtype: jnp.dtype = jnp.bfloat16
    # Sliding-window attention (Mistral v0.1-style): position t attends to
    # (t - window, t]. None = full causal (reference fork supports the
    # window, `evaluations/RULER/pred/mistral_ref.py:305`).
    sliding_window: int | None = None
    # Weight storage: "int8" = W8A8 per-channel weights + dynamic per-token
    # activation quant on the native s8 MXU path (models/llama.py
    # QuantWeight) — halves weight HBM (decode at small batch is
    # weight-bandwidth-bound) and is what fits 8B-class models on a 16 GB
    # chip at 96K context. "int4" = W4A8 grouped-int4 weights (128-input
    # groups, Quant4Weight): halves the weight stream again and fits
    # 8B @ 96K with the block_topk4 state on one chip.
    weight_quant: str = "none"
    # Fuse q/k/v and gate/up into single wider quantized matmuls
    # (models/llama.py::fuse_params): the M=1 decode step pays a per-call
    # fixed cost on every small projection, so 7 calls/layer -> 4.
    # Bitwise-equal math (quantize-then-concat). Single-chip decode only
    # — the TP pspecs shard the unfused layout.
    fuse_small_linears: bool = False

    @property
    def num_key_value_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_hf_config(cls, path_or_dict, name: str = "hf-model") -> "ModelConfig":
        """Build from a HuggingFace config.json (path or parsed dict)."""
        if isinstance(path_or_dict, (str, os.PathLike)):
            with open(path_or_dict) as f:
                cfg = json.load(f)
        else:
            cfg = dict(path_or_dict)
        rs = cfg.get("rope_scaling") or None
        scaling = None
        if rs is not None:
            scaling = RopeScaling(
                rope_type=rs.get("rope_type", rs.get("type", "default")),
                factor=rs.get("factor", 8.0),
                low_freq_factor=rs.get("low_freq_factor", 1.0),
                high_freq_factor=rs.get("high_freq_factor", 4.0),
                original_max_position_embeddings=rs.get(
                    "original_max_position_embeddings", 8192
                ),
            )
        eos = cfg.get("eos_token_id", 2)
        eos = tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)
        hidden = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        return cls(
            name=name,
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=cfg.get("num_key_value_heads", heads),
            head_dim=cfg.get("head_dim", hidden // heads),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=scaling,
            max_position_embeddings=cfg.get("max_position_embeddings", 131072),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_ids=eos,
            sliding_window=cfg.get("sliding_window"),
        )


_LLAMA3_SCALING = RopeScaling(
    rope_type="llama3",
    factor=8.0,
    low_freq_factor=1.0,
    high_freq_factor=4.0,
    original_max_position_embeddings=8192,
)

_LLAMA32_SCALING = dataclasses.replace(_LLAMA3_SCALING, factor=32.0)

PRESETS: dict[str, ModelConfig] = {
    # Tiny config for unit tests (fits CPU, exercises GQA).
    "llama-tiny": ModelConfig(
        name="llama-tiny",
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=10000.0,
        rope_scaling=None,
        max_position_embeddings=4096,
        eos_token_ids=(0,),
    ),
    "llama-3.2-1b": ModelConfig(
        name="llama-3.2-1b",
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=16,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=64,
        rope_scaling=_LLAMA32_SCALING,
        tie_word_embeddings=True,
    ),
    "llama-3.2-3b": ModelConfig(
        name="llama-3.2-3b",
        hidden_size=3072,
        intermediate_size=8192,
        num_hidden_layers=28,
        num_attention_heads=24,
        num_key_value_heads=8,
        head_dim=128,
        rope_scaling=_LLAMA32_SCALING,
        tie_word_embeddings=True,
    ),
    "llama-3.1-8b": ModelConfig(
        name="llama-3.1-8b",
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        rope_scaling=_LLAMA3_SCALING,
    ),
    "llama-3.1-70b": ModelConfig(
        name="llama-3.1-70b",
        hidden_size=8192,
        intermediate_size=28672,
        num_hidden_layers=80,
        num_attention_heads=64,
        num_key_value_heads=8,
        head_dim=128,
        rope_scaling=_LLAMA3_SCALING,
    ),
    "llama-2-7b": ModelConfig(
        name="llama-2-7b",
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=32,
        head_dim=128,
        rope_theta=10000.0,
        max_position_embeddings=4096,
        eos_token_ids=(2,),
    ),
    "mistral-7b": ModelConfig(
        name="mistral-7b",
        vocab_size=32768,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        rope_theta=1000000.0,
        max_position_embeddings=131072,
        eos_token_ids=(2,),
    ),
}


def default_dense_layers(num_layers: int) -> tuple[int, ...]:
    """Layers that keep full (dense) attention.

    The reference hard-codes [0, 16, 32, 48, 64] and relies on layers beyond
    `num_layers` being no-ops (`models/attnserver.py:18`): for a 32-layer
    model that means layers {0, 16}. We keep the same rule.
    """
    return tuple(l for l in (0, 16, 32, 48, 64) if l < num_layers)


ESTIMATORS = ("lsh", "quest", "topk", "oracle_sampling", "block_topk")


@dataclasses.dataclass(frozen=True)
class LSHConfig:
    """Sparse-attention estimator parameters.

    LSH knobs mirror the reference (`models/attnserver.py:9-20`): K bits per
    hash table, L tables. K=0 disables sampling entirely (full attention
    everywhere), matching the reference's `K=0 → AttnServer` selection
    (`models/llama.py:91-96`); K<0 selects the Quest baseline like the
    reference's TP runtime (`evaluations/RULER/pred/llama_dist.py:122-133`).

    `estimator` picks the sparse-layer algorithm:
      * "lsh"             — SimHash >=2-of-L sampling + debias (the system)
      * "quest"           — page-landmark top-k (reference `quest_cache.py`)
      * "topk"            — oracle exact top-k (reference `topk_cache.py`)
      * "oracle_sampling" — softmax sampling bound (`oraclesampling_cache.py`)
    """

    K: int = 10
    L: int = 150
    num_sink_tokens: int = 4
    num_local_tokens: int = 64
    generation_buffer: int = 256
    dense_layers: tuple[int, ...] | None = None  # None → default rule
    # Static per-head sample budget as a fraction of the offloaded
    # (middle) sequence. The expected collision rate at K=10/L=150 is ~2%
    # (README.md:37-45); 6% gives generous headroom before truncation.
    sample_budget_frac: float = 0.06
    min_sample_budget: int = 128
    # Decode formulation: "masked" streams K/V once and -inf-masks
    # non-sampled lanes — the PRODUCTION path (bandwidth-optimal on TPU; see
    # BENCHMARKS.md "DMA wall"). "sampled" compacts the collision mask to a
    # static budget of token ids and gathers the rows — a research path:
    # its FLOPs scale with the budget but the scattered gather runs at
    # ~9 GB/s on TPU, slower than streaming the whole cache. Both are
    # mathematically identical whenever the budget covers every collision.
    decode_mode: str = "masked"
    # Sparse-layer estimator (see class docstring).
    estimator: str = "lsh"
    # Quest: page size and page budget as a fraction of the offload length
    # (reference QuestAttnServer: 16-token chunks, 4% budget,
    # `attnserver_dist.py:29-224`).
    quest_page_size: int = 16
    quest_budget_frac: float = 0.04
    # TopK oracle / OracleSampling token budgets (fraction of offload).
    topk_budget_frac: float = 0.02
    os_budget_frac: float = 0.02
    # block_topk (TPU-native fast estimator): exact-score block ranking.
    block_topk_block_size: int = 512
    block_topk_budget_frac: float = 0.08
    # Pallas pipeline for quantized block_topk decode: "rescore" (default)
    # ranks from block-maxes only and recomputes selected blocks' scores
    # in-kernel (the [B,Hq,S] f32 scores never touch HBM,
    # ops/pallas/rescore_attend.py); "store" keeps the round-2 score-store
    # pipeline (exact_scores_ranked + block_attend) — the measured-history
    # fallback. The two are parity-tested equal.
    block_topk_pipeline: str = "rescore"
    # LSH masked decode backend: "auto" uses the fused Pallas streaming
    # kernel on TPU (ops/pallas/lsh_decode.py) and pure XLA elsewhere;
    # "on"/"off" force it. The Pallas path currently requires bf16 offload.
    use_pallas: str = "auto"
    # Fallback: emit one B=1 pallas_call per request in the fused LSH
    # kernel instead of one batched grid. Only needed if a toolchain
    # regresses the batched compile (the round-2 remote-compile crash,
    # fixed by round 4 — results/probe_r4/lsh_scan_96k.log).
    batch_split: bool = False
    # Importance-sampling debias applied to LSH-sampled scores:
    # "exact" = the reference's -log(w) reweight (`transform_kernel`,
    # sparse_attention.cc:164-184); "poly" = one-polynomial approximation
    # (ops/debias.py); "none" DISABLES the reweight — sampled scores go
    # straight to softmax, turning the estimator into plain collision
    # top-sampling. Diagnostic knob: whether the debias earns its keep is
    # part of the reference's central claim.
    lsh_debias: str = "exact"
    # Offload-region KV storage: "none" keeps the model dtype (bf16);
    # "int8" stores per-row symmetric-quantized K/V with f32 scales —
    # halves the sparse layers' HBM state and doubles effective scoring
    # bandwidth. "int4" further quantizes K (scores/debias only) to a
    # 4-bit grid while V stays int8 (V carries the output values). For
    # block_topk at d >= 64 the int4 K is stored packed two-per-byte
    # (`ops/pack4.py`, see `packed_k4`) — halving both the scorer's
    # dominant HBM stream and the off_k state; other estimators keep the
    # int8 layout (accuracy knob only). Dense layers and the hot
    # (sink/local) buffer stay exact.
    offload_quant: str = "none"
    # Dense-layer KV storage: "int8" stores the full-attention layers'
    # cache per-row symmetric-quantized with fold-major f32 scales
    # (dequant in-register in flash_decode). At 96K a dense layer streams
    # 200 MB/request/step in bf16 — int8 halves that and the dense state.
    # Applies to dense layers under any estimator AND to the K=0 full-
    # attention baseline. Default exact.
    dense_quant: str = "none"

    def __post_init__(self):
        assert self.estimator in ESTIMATORS, self.estimator
        assert self.offload_quant in ("none", "int8", "int4"), \
            self.offload_quant
        assert self.dense_quant in ("none", "int8"), self.dense_quant
        assert self.block_topk_pipeline in ("rescore", "store"), \
            self.block_topk_pipeline
        assert self.lsh_debias in ("exact", "poly", "none"), self.lsh_debias

    @property
    def offload_quantized(self) -> bool:
        return self.offload_quant != "none"

    @property
    def dense_quantized(self) -> bool:
        return self.dense_quant != "none"

    @property
    def offload_k_bits(self) -> int:
        return 4 if self.offload_quant == "int4" else 8

    def packed_k4(self, head_dim: int) -> bool:
        """Store the offload K packed-int4 (`ops/pack4.py`)? Only the
        block_topk scorer reads K, the pack span must equal the ranking
        block, and the compiled attend's per-block score DMA needs
        span/(2*fold) % 128 == 0 (true for d >= 64)."""
        from magicpig_tpu.ops.pack4 import SPAN_TOKENS

        fold = max(128 // head_dim, 1)
        return (self.offload_quant == "int4"
                and self.estimator == "block_topk"
                and self.block_topk_block_size == SPAN_TOKENS
                and (SPAN_TOKENS // (2 * fold)) % 128 == 0)

    @property
    def enabled(self) -> bool:
        """Sparse layers active? (K=0 = full attention everywhere.)"""
        return self.K != 0

    def dense_layers_for(self, num_layers: int) -> tuple[int, ...]:
        if not self.enabled:
            return tuple(range(num_layers))
        if self.dense_layers is not None:
            return tuple(l for l in self.dense_layers if l < num_layers)
        if self.estimator in ("lsh", "block_topk"):
            return default_dense_layers(num_layers)
        # The reference baselines keep layers {0, 1} dense
        # (`quest_cache.py:128`, `topk_cache.py`, `oraclesampling_cache.py`).
        return tuple(l for l in (0, 1) if l < num_layers)

    def sample_budget(self, offload_len: int) -> int:
        """Static padded budget of sampled tokens per (head, step)."""
        b = max(self.min_sample_budget, int(math.ceil(offload_len * self.sample_budget_frac)))
        # Round to a lane-friendly multiple.
        return min(offload_len, ((b + 127) // 128) * 128)


def preset(name: str) -> ModelConfig:
    if name in PRESETS:
        return PRESETS[name]
    raise KeyError(f"unknown model preset {name!r}; known: {sorted(PRESETS)}")
