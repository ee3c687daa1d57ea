"""Mesh-based parallelism: tensor-parallel heads + data-parallel batch.

TPU-native equivalent of the reference's Megatron-style TP runtime
(`evaluations/RULER/pred/llama_dist.py:47-77`: column-split q/k/v/gate/up,
row-split o/down, NCCL all-reduce after o_proj and down_proj at :209,218).
Here the same math is expressed as shardings over a `("data", "model")`
mesh; XLA GSPMD inserts the ICI all-reduces. The attention servers shard by
KV head — each shard holds its heads' caches, codes and sampled partials,
exactly like the reference's per-rank head-sharded servers
(`attnserver_dist.py:252-254,587-589`). Hash projections are replicated
from a shared PRNG key (replaces the rank-0 broadcast at
`attnserver_dist.py:279`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from magicpig_tpu.models.llama import (LayerParams, LlamaParams, Quant4Weight, QuantWeight)
from magicpig_tpu.runtime.state import DecodeState


def _wspec(w, spec: P):
    """Spec for a (possibly quantized) matmul weight: QuantWeight scales
    live on the OUTPUT channel axis, so their spec is the weight spec with
    the input axis (-2) dropped; Quant4Weight scales are [..., in//128,
    out] — the group axis shards exactly like the input axis it tiles
    (per-shard `in` is a multiple of 128 for every supported split), so
    the spec is the weight spec unchanged."""
    if isinstance(w, Quant4Weight):
        return Quant4Weight(q=spec, scale=spec)
    if isinstance(w, QuantWeight):
        parts = tuple(spec)
        return QuantWeight(q=spec, scale=P(*(parts[:-2] + parts[-1:])))
    return spec


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def make_multihost_mesh(n_model: int | None = None) -> Mesh:
    """Mesh spanning all processes of a multi-host run.

    Layout rule (scaling-book recipe): the `model` axis (tensor-parallel
    heads + their hash/cache shards, all-reduced every layer) stays INSIDE a
    host's ICI domain; the `data` axis (independent requests, no per-layer
    collectives) spans hosts over DCN. `jax.distributed.initialize()` must
    have been called by the launcher. Single-process runs fall back to the
    local device set.
    """
    from jax.experimental import mesh_utils

    n_dev = len(jax.devices())
    local = max(len(jax.local_devices()), 1)
    if n_model is None:
        n_model = min(local, n_dev)
    assert n_dev % n_model == 0, (n_dev, n_model)
    grid = mesh_utils.create_device_mesh(
        (n_dev // n_model, n_model),
        allow_split_physical_axes=True,
    )
    return Mesh(grid, ("data", "model"))


def param_pspecs(params: LlamaParams) -> LlamaParams:
    """Megatron TP layout: attention/MLP inner dims on `model`."""
    lw = params.layers
    layer_specs = LayerParams(
        wq=_wspec(lw.wq, P(None, None, "model")),
        wk=_wspec(lw.wk, P(None, None, "model")),
        wv=_wspec(lw.wv, P(None, None, "model")),
        wo=_wspec(lw.wo, P(None, "model", None)),
        w_gate=_wspec(lw.w_gate, P(None, None, "model")),
        w_up=_wspec(lw.w_up, P(None, None, "model")),
        w_down=_wspec(lw.w_down, P(None, "model", None)),
        ln_attn=P(None, None),
        ln_mlp=P(None, None),
    )
    return LlamaParams(
        embed=P(None, None),
        lm_head=_wspec(params.lm_head, P(None, "model")),  # vocab-sharded
        final_ln=P(None),
        layers=layer_specs,
        cos=P(None, None),
        sin=P(None, None),
    )


def state_pspecs(state: DecodeState) -> DecodeState:
    """Caches shard by (batch -> data, kv-head -> model); per-layer tuples."""
    def per(field, spec):
        return tuple(spec for _ in field)

    kv = P("data", "model", None, None)
    return DecodeState(
        dense_k=per(state.dense_k, kv), dense_v=per(state.dense_v, kv),
        dense_k_scale=per(state.dense_k_scale,
                          P("data", "model", None, None)),
        dense_v_scale=per(state.dense_v_scale,
                          P("data", "model", None, None)),
        dense_len=P("data"),
        hot_k=per(state.hot_k, kv), hot_v=per(state.hot_v, kv),
        hot_len=P("data"),
        off_k=per(state.off_k, kv), off_v=per(state.off_v, kv),
        off_k_scale=per(state.off_k_scale,
                        P("data", "model", None, None)),
        off_v_scale=per(state.off_v_scale,
                        P("data", "model", None, None)),
        off_len=P("data"),
        k_norm=per(state.k_norm, P("data", "model", None, None)),
        avg_k=per(state.avg_k, P("data", "model", None)),
        planes=per(state.planes, P("data", "model", None, None, None)),
        quest_min=per(state.quest_min, kv),
        quest_max=per(state.quest_max, kv),
        pos=P("data"),
        step=P(),
    )


def _put(tree, spec_tree, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree)


def shard_engine(llm, mesh: Mesh, seq_axis: str | None = None):
    """Shard an existing LLM engine's params and state over `mesh`.

    The engine's jitted functions pick up shardings from their inputs
    (GSPMD propagation); donated state keeps its sharding across steps.

    `seq_axis`: name of a mesh axis to shard PREFILL over the sequence
    (ring attention, `parallel/ring.py`) — prefill is per-request, so the
    `data` axis (idle during a fill) is the natural choice. Decode
    shardings are unaffected.
    """
    assert llm.config.num_key_value_heads % mesh.shape["model"] == 0, (
        "kv heads must divide the model axis")
    assert llm.batch_size % mesh.shape["data"] == 0, (
        "batch must divide the data axis")
    if seq_axis is not None:
        assert seq_axis in mesh.shape, (seq_axis, mesh.shape)
    llm.params = _put(llm.params, param_pspecs(llm.params), mesh)
    llm.state = _put(llm.state, state_pspecs(llm.state), mesh)
    llm.projections = jax.device_put(
        llm.projections, NamedSharding(mesh, P(None, None)))
    llm.mesh = mesh
    llm.seq_axis = seq_axis
    return llm
