#!/usr/bin/env python
"""Run the remaining round-5 RULER configs in ONE process (one chip claim).

The axon claim is a per-process lottery tonight (~50% wedge at backend
init); spawning one ruler_eval per config re-rolls it every time. This
runner claims once, proves the claim healthy with a trivial device op
(so the outer watchdog can kill a wedge within its startup window), then
runs every remaining config in-process. Resume: per-task prediction
files skip completed indices, so re-entry is cheap.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t0 = time.time()
import jax.numpy as jnp

print(f"claim: {(jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()} "
      f"({time.time()-t0:.0f}s)", flush=True)

from magicpig_tpu.config import LSHConfig
from magicpig_tpu.evals.ruler.predict import run_suite
from magicpig_tpu.runtime.engine import LLM
from magicpig_tpu.utils.tokenizer import get_tokenizer
from train_ruler_lm import load_params, model_config

SEQ = 1152
ML = SEQ * 6
N = 50
OUT = "results/ruler_r5"

CONFIGS = [
    ("quest", dict(estimator="quest", K=10), ""),
    ("topk", dict(estimator="topk", K=10), ""),
    ("bt4", dict(estimator="block_topk", K=10, offload_quant="int4"),
     "_bt4"),
]

cfg = model_config()
params = load_params("data/ruler_lm_v2.npz", cfg, ML)
tok = get_tokenizer(None)

for name, kw, tag in CONFIGS:
    lsh = LSHConfig(L=150, decode_mode="masked", **kw)
    out_dir = os.path.join(OUT, f"{cfg.name}_seq{SEQ}_{lsh.estimator}_"
                                f"K{lsh.K}L{lsh.L}{tag}")
    print(f"=== {name} -> {out_dir}", flush=True)
    llm = LLM(cfg, batch_size=1, max_length=ML, lsh=lsh, params=params,
              seed=0)
    results = run_suite(llm, tok, out_dir, tasks=None, num_samples=N,
                        target_tokens=SEQ, seed=42)
    avg = sum(r["score"] for r in results.values()) / max(len(results), 1)
    print(f"== {name}: 13-task avg {avg:.2f} ({time.time()-t0:.0f}s)",
          flush=True)
    del llm
print("MULTI DONE", flush=True)
