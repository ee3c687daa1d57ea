"""Prediction driver: run an engine over generated task samples.

Equivalent of the reference's `pred/call_api.py` + `pred/xllm_gen.py` loop:
greedy decoding at temperature 0, per-task `tokens_to_generate`, resumable
by skipping already-predicted indices (`call_api.py:237-241`,
`xllm_gen.py:136-140` — the reference's only fault-tolerance mechanism), and
an avg-sparsity report per task (`xllm_gen.py:184-190`).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from magicpig_tpu.evals.ruler.tasks import TASK_SUITE, generate_task
from magicpig_tpu.evals.ruler.score import score_predictions, write_summary


def _existing_indices(path: str) -> set[int]:
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["index"])
                except Exception:
                    continue
    return done


def predict_task(llm, tokenizer, task: str, out_file: str,
                 num_samples: int = 50, target_tokens: int = 16384,
                 seed: int = 42, verbose: bool = True) -> dict:
    """Run one task; returns {"score", "n", "nulls", "avg_sparsity"}."""
    spec = TASK_SUITE[task]
    samples = generate_task(task, num_samples, target_tokens, seed=seed,
                            tokenizer=tokenizer)
    done = _existing_indices(out_file)
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    # Per-task sparsity: delta of the engine's lifetime counters, so one
    # engine reused across tasks reports each task's own average (reference
    # per-run report, `xllm_gen.py:184-190`).
    snap = llm.sparsity_snapshot() if hasattr(llm, "sparsity_snapshot") else None

    with open(out_file, "a") as f:
        for s in samples:
            if s["index"] in done:
                continue
            prompt = s["input"] + s["answer_prefix"]
            ids = tokenizer.encode(prompt)
            max_ctx = llm.max_length - spec.tokens_to_generate - 1
            if len(ids) > max_ctx:  # front-truncate like long-context evals
                ids = ids[:4] + ids[len(ids) - (max_ctx - 4):]
            t0 = time.time()
            out_ids = llm.generate(np.asarray(ids, np.int32),
                                   max_tokens=spec.tokens_to_generate,
                                   temperature=0.0)
            pred = tokenizer.decode(out_ids)
            row = {
                "index": s["index"],
                "pred": pred,
                "outputs": s["outputs"],
                "input_tokens": len(ids),
                "time_s": round(time.time() - t0, 2),
            }
            f.write(json.dumps(row) + "\n")
            f.flush()
            if verbose:
                print(f"[{task}] {s['index']}: {len(ids)} tok -> "
                      f"{pred[:60]!r}", flush=True)

    result = score_predictions(out_file, spec.metric)
    result["avg_sparsity"] = float(llm.avg_sparsity_since(snap) if snap
                                   else llm.avg_sparsity)
    return result


def run_suite(llm, tokenizer, out_dir: str, tasks=None, num_samples: int = 50,
              target_tokens: int = 16384, seed: int = 42) -> dict:
    """Run a list of tasks (default: all 13) and write summary.csv."""
    tasks = tasks or list(TASK_SUITE)
    results = {}
    for t in tasks:
        out_file = os.path.join(out_dir, f"{t}.jsonl")
        results[t] = predict_task(llm, tokenizer, t, out_file,
                                  num_samples=num_samples,
                                  target_tokens=target_tokens, seed=seed)
        print(f"[{t}] score={results[t]['score']} "
              f"nulls={results[t]['nulls']} "
              f"sparsity={results[t]['avg_sparsity']:.4f}", flush=True)
    write_summary(results, out_dir)
    return results
