#!/usr/bin/env python
"""RULER-equivalent evaluation CLI.

Mirrors the reference's run pipeline (`evaluations/RULER/run.sh`: data-gen →
predict → score) as one command. Examples:

  # smoke-run two tasks at 4k context on the tiny model
  python examples/ruler_eval.py --model llama-tiny --tasks niah_single_1 vt \
      --seq 4096 --samples 5 --max-length 8192

  # full 13-task suite at 16k with a local checkpoint, K=10 L=150
  python examples/ruler_eval.py --checkpoint /path/to/llama-3.1-8b \
      --seq 16384 --samples 50 --K 10 --L 150

Estimator selection follows the reference conventions: --K 0 → full
attention, --K < 0 → Quest (`llama_dist.py:122-133`), --estimator overrides.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llama-tiny")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--npz", type=str, default=None,
                   help="from-scratch byte-LM checkpoint "
                        "(examples/train_ruler_lm.py) — the zero-egress "
                        "path to a discriminating full-attention score")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--tasks", type=str, nargs="*", default=None,
                   help="subset of tasks (default: all 13)")
    p.add_argument("--seq", type=int, default=16384,
                   help="target context tokens (reference grid: 16384 32768 "
                        "65536 98304)")
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--L", type=int, default=150)
    p.add_argument("--estimator", type=str, default=None,
                   choices=["lsh", "quest", "topk", "oracle_sampling",
                            "block_topk"])
    p.add_argument("--decode-mode", type=str, default="masked",
                   choices=["sampled", "masked"])
    p.add_argument("--debias", type=str, default="exact",
                   choices=["exact", "poly", "none"],
                   help="lsh importance-sampling reweight (none = plain "
                        "collision sampling — the budget-matched "
                        "diagnostic row)")
    p.add_argument("--budget-frac", type=float, default=None,
                   help="override the selected estimator's token/block "
                        "budget fraction (budget-matched comparisons, "
                        "e.g. topk at lsh's 2.5%% realized coverage)")
    p.add_argument("--block-size", type=int, default=None,
                   help="block_topk ranking block size override (small "
                        "blocks let a 2.5%% budget resolve at short "
                        "contexts)")
    p.add_argument("--offload-quant", type=str, default=None,
                   choices=["none", "int8", "int4"])
    p.add_argument("--tag", type=str, default="",
                   help="suffix for the output directory name")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS env is ignored "
                        "under axon; only jax.config works)")
    p.add_argument("--max-length", type=int, default=None)
    p.add_argument("--out", type=str, default="ruler_out")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from magicpig_tpu.config import LSHConfig, preset
    from magicpig_tpu.evals.ruler.predict import run_suite
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.utils.tokenizer import get_tokenizer

    max_len = args.max_length or (args.seq + 512)
    if args.checkpoint:
        from magicpig_tpu.models.loader import load_checkpoint

        config, params = load_checkpoint(args.checkpoint, max_len)
    elif args.npz:
        from train_ruler_lm import load_params, model_config

        config = model_config()
        params = load_params(args.npz, config, max_len)
    else:
        config, params = preset(args.model), None

    kw = {}
    if args.estimator:
        kw["estimator"] = args.estimator
        kw["K"] = abs(args.K) or 10
    elif args.K < 0:
        kw["estimator"] = "quest"
        kw["K"] = -args.K
    else:
        kw["K"] = args.K
    if args.budget_frac is not None:
        est = kw.get("estimator", "lsh")
        frac_field = {"topk": "topk_budget_frac",
                      "block_topk": "block_topk_budget_frac",
                      "quest": "quest_budget_frac",
                      "oracle_sampling": "os_budget_frac"}.get(est)
        if frac_field:
            kw[frac_field] = args.budget_frac
    if args.block_size is not None:
        kw["block_topk_block_size"] = args.block_size
    if args.offload_quant is not None:
        kw["offload_quant"] = args.offload_quant
    lsh = LSHConfig(L=args.L, decode_mode=args.decode_mode,
                    lsh_debias=args.debias, **kw)

    llm = LLM(config, batch_size=1, max_length=max_len, lsh=lsh,
              params=params, seed=0)
    tok = get_tokenizer(args.tokenizer or args.checkpoint)

    out_dir = os.path.join(args.out, f"{config.name}_seq{args.seq}_"
                                     f"{lsh.estimator}_K{lsh.K}L{lsh.L}"
                                     f"{args.tag}")
    results = run_suite(llm, tok, out_dir, tasks=args.tasks,
                        num_samples=args.samples, target_tokens=args.seq,
                        seed=args.seed)
    avg = sum(r["score"] for r in results.values()) / max(len(results), 1)
    print(f"\n== {config.name} seq={args.seq} {lsh.estimator} "
          f"K{lsh.K}/L{lsh.L}: average score {avg:.2f} ==")
    print(f"summary: {os.path.join(out_dir, 'summary.csv')}")


if __name__ == "__main__":
    main()
