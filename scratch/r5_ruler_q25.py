#!/usr/bin/env python
"""Budget-matched Quest row: quest at 2.5% on the 7 discriminating tasks.

Completes the round-5 diagnosis grid — the reference's headline figure is
MagicPIG-vs-Quest on RULER (`/root/reference/README.md:37-45`), and the
unconstrained quest row ran at ~4-6% realized coverage (2x the lsh
budget). One process, one claim (see r5_ruler_multi.py for why).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

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

SEQ, N = 1152, 50
ML = SEQ * 6
OUT = "results/ruler_r5"
DISC = ["niah_single_1", "niah_single_2", "niah_single_3",
        "niah_multikey_1", "niah_multiquery", "niah_multivalue", "vt"]

cfg = model_config()
params = load_params("data/ruler_lm_v2.npz", cfg, ML)
tok = get_tokenizer(None)
lsh = LSHConfig(L=150, decode_mode="masked", estimator="quest", K=10,
                quest_budget_frac=0.025)
out_dir = os.path.join(OUT, f"{cfg.name}_seq{SEQ}_quest_K10L150_bf025")
llm = LLM(cfg, batch_size=1, max_length=ML, lsh=lsh, params=params, seed=0)
results = run_suite(llm, tok, out_dir, tasks=DISC, num_samples=N,
                    target_tokens=SEQ, seed=42)
avg = sum(r["score"] for r in results.values()) / max(len(results), 1)
print(f"== quest@2.5%: 7-task avg {avg:.2f} ({time.time()-t0:.0f}s)",
      flush=True)
