#!/usr/bin/env python
"""Single-prompt chat generation (reference `examples/generation.py`).

Args mirror the reference CLI (`generation.py:9-19`): --model/--M/--G/--K/
--L/--t/--template/--data. --model may be a preset shape (random weights,
for smoke runs) or a local HF checkpoint directory (safetensors).
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llama-tiny",
                   help="preset name or HF checkpoint dir")
    p.add_argument("--M", type=int, default=4096, help="max length")
    p.add_argument("--G", type=int, default=64, help="generation length")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--L", type=int, default=150)
    p.add_argument("--t", type=float, default=0.6, help="temperature")
    p.add_argument("--template", type=str, default="None",
                   choices=["meta-llama2", "meta-llama3", "None"])
    p.add_argument("--data", type=str, default=None,
                   help="text file to use as the prompt")
    p.add_argument("--weight-quant", type=str, default="none",
                   choices=["none", "int8", "int4"],
                   help="W8A8 / W4A8 weight quantization (bench formats; "
                        "int4 is what fits 8B @ 96K on one chip)")
    args = p.parse_args()

    import os

    from magicpig_tpu.config import PRESETS, LSHConfig
    from magicpig_tpu.models.template import Templates
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.utils.tokenizer import get_tokenizer

    if args.data:
        with open(args.data) as f:
            text = f.read()
    else:
        text = "Tell me a story about a tiny TPU that learned to hash."
    text = Templates[args.template].format(text)

    tok = get_tokenizer(args.model if os.path.isdir(args.model) else None)
    ids = tok.encode(text)

    if os.path.isdir(args.model):
        from magicpig_tpu.models.loader import load_checkpoint

        cfg, params = load_checkpoint(args.model, args.M,
                                      weight_quant=args.weight_quant)
        llm = LLM(cfg, max_length=args.M, lsh=LSHConfig(K=args.K, L=args.L),
                  params=params)
    else:
        assert args.model in PRESETS, f"unknown preset {args.model}"
        import dataclasses

        from magicpig_tpu.config import preset

        cfg = preset(args.model)
        if args.weight_quant != "none":
            cfg = dataclasses.replace(cfg, weight_quant=args.weight_quant)
        llm = LLM(cfg, max_length=args.M,
                  lsh=LSHConfig(K=args.K, L=args.L))

    ids = ids[: args.M - args.G - 1]
    out = llm.generate(ids, max_tokens=args.G, temperature=args.t,
                       verbose=True)
    print(tok.decode(out))


if __name__ == "__main__":
    main()
