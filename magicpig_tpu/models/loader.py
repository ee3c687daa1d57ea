"""Load Llama-family weights into `LlamaParams`.

Supports HF safetensors checkpoints (directory with *.safetensors +
config.json) and in-memory HF state dicts (for tests against transformers).
Equivalent of the reference's `LLM.init_parameters`
(`models/llama.py:102-136`), which detaches per-layer HF tensors; we map the
same names, transposing linear weights for right-multiply.
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np

from magicpig_tpu.config import ModelConfig
from magicpig_tpu.models.llama import LayerParams, LlamaParams
from magicpig_tpu.ops.rope import rope_cos_sin


def _to_np(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().to("cpu").float().numpy()
    except AttributeError:
        return np.asarray(t)


def params_from_state_dict(config: ModelConfig, sd: dict, max_len: int,
                           dtype=None) -> LlamaParams:
    """Build params from an HF-style state dict (torch tensors or ndarrays)."""
    dt = dtype or config.dtype
    n = config.num_hidden_layers

    def get(name):
        return _to_np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i)) for i in range(n)]
        ws = np.stack(ws)
        if transpose:
            ws = ws.transpose(0, 2, 1)  # HF stores [out, in]; we use [in, out]
        return jnp.asarray(ws, dt)

    layers = LayerParams(
        wq=stack("model.layers.{}.self_attn.q_proj.weight"),
        wk=stack("model.layers.{}.self_attn.k_proj.weight"),
        wv=stack("model.layers.{}.self_attn.v_proj.weight"),
        wo=stack("model.layers.{}.self_attn.o_proj.weight"),
        w_gate=stack("model.layers.{}.mlp.gate_proj.weight"),
        w_up=stack("model.layers.{}.mlp.up_proj.weight"),
        w_down=stack("model.layers.{}.mlp.down_proj.weight"),
        ln_attn=stack("model.layers.{}.input_layernorm.weight", transpose=False),
        ln_mlp=stack("model.layers.{}.post_attention_layernorm.weight",
                     transpose=False),
    )
    embed = jnp.asarray(get("model.embed_tokens.weight"), dt)
    if config.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(get("lm_head.weight").T, dt)
    cos, sin = rope_cos_sin(config, max_len)
    params = LlamaParams(
        embed=embed,
        lm_head=lm_head,
        final_ln=jnp.asarray(get("model.norm.weight"), dt),
        layers=layers,
        cos=cos,
        sin=sin,
    )
    if config.weight_quant in ("int8", "int4"):
        from magicpig_tpu.models.llama import fuse_params, quantize_params

        params = quantize_params(
            params, bits=4 if config.weight_quant == "int4" else 8)
        if config.fuse_small_linears:
            params = fuse_params(params)
    return params


def load_checkpoint(path: str, max_len: int, dtype=None,
                    weight_quant: str = "none"):
    """Load (config, params) from a HF checkpoint directory."""
    import dataclasses

    from safetensors import safe_open

    config = ModelConfig.from_hf_config(
        os.path.join(path, "config.json"), name=os.path.basename(path))
    if weight_quant != "none":
        config = dataclasses.replace(config, weight_quant=weight_quant)
    sd = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for f in files:
        with safe_open(f, framework="np") as reader:
            for name in reader.keys():
                sd[name] = reader.get_tensor(name)
    return config, params_from_state_dict(config, sd, max_len, dtype)
