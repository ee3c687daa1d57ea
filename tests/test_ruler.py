"""RULER-equivalent harness tests: generators, metrics, end-to-end drive."""

import json
import os

import numpy as np
import pytest

from magicpig_tpu.evals.ruler.score import (
    score_predictions,
    string_match_all,
    string_match_part,
    write_summary,
)
from magicpig_tpu.evals.ruler.tasks import TASK_SUITE, generate_task


def test_suite_has_reference_13_tasks():
    """Task list mirrors the reference protocol (config_tasks.sh:32-46)."""
    expected = {
        "niah_single_1", "niah_single_2", "niah_single_3",
        "niah_multikey_1", "niah_multikey_2", "niah_multikey_3",
        "niah_multivalue", "niah_multiquery", "vt", "cwe", "fwe",
        "qa_1", "qa_2",
    }
    assert set(TASK_SUITE) == expected


@pytest.mark.parametrize("task", sorted(TASK_SUITE))
def test_generators_are_deterministic_and_embed_answers(task):
    a = generate_task(task, 2, 2048, seed=7)
    b = generate_task(task, 2, 2048, seed=7)
    assert [s["input"] for s in a] == [s["input"] for s in b]
    for s in a:
        assert s["outputs"], task
        assert 500 < s["length"] < 3500, (task, s["length"])
        if task.startswith("niah") or task == "vt":
            for ans in s["outputs"]:
                assert ans in s["input"], (task, ans)


def test_generators_scale_with_target():
    short = generate_task("niah_single_2", 1, 1024, seed=1)[0]["length"]
    long = generate_task("niah_single_2", 1, 8192, seed=1)[0]["length"]
    assert 0.6 * 1024 < short < 1.3 * 1024
    assert 0.6 * 8192 < long < 1.3 * 8192


def test_string_match_metrics():
    # reference formulas, eval/synthetic/constants.py:25-31
    assert string_match_all(["a b c"], [["a", "b", "x"]]) == round(2 / 3 * 100, 2)
    assert string_match_part(["the answer is Foo"], [["foo", "bar"]]) == 100.0
    assert string_match_part([""], [["x"]]) == 0.0


def test_score_and_summary(tmp_path):
    pred = tmp_path / "t.jsonl"
    rows = [
        {"index": 0, "pred": "it is 12345 indeed", "outputs": ["12345"]},
        {"index": 1, "pred": "", "outputs": ["99999"]},
    ]
    pred.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    r = score_predictions(str(pred), "string_match_all")
    assert r == {"score": 50.0, "n": 2, "nulls": 1}
    path = write_summary({"t": r}, str(tmp_path))
    assert os.path.exists(path)
    text = open(path).read()
    assert "t,50.0,2,1" in text and "average,50.0" in text


def test_predict_task_end_to_end_and_resume(tmp_path):
    """Drive the tiny engine through one tiny task; then resume skips."""
    import dataclasses

    import jax.numpy as jnp

    from magicpig_tpu.config import LSHConfig, preset
    from magicpig_tpu.evals.ruler.predict import predict_task
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.utils.tokenizer import ByteTokenizer

    cfg = dataclasses.replace(preset("llama-tiny"), dtype=jnp.float32)
    # generation_buffer must cover the task's tokens_to_generate (128) —
    # the engine now fails loudly instead of clamping the cache append.
    lsh = LSHConfig(K=4, L=16, num_sink_tokens=2, num_local_tokens=8,
                    generation_buffer=160)
    llm = LLM(cfg, batch_size=1, max_length=2048, chunk_size=256, lsh=lsh)
    tok = ByteTokenizer()

    out = str(tmp_path / "niah.jsonl")
    r = predict_task(llm, tok, "niah_single_1", out, num_samples=2,
                     target_tokens=280, seed=3, verbose=False)
    assert r["n"] == 2 and 0 <= r["score"] <= 100
    assert r["avg_sparsity"] > 0
    mtime = os.path.getmtime(out)
    n_lines = len(open(out).readlines())
    assert n_lines == 2
    # resume: nothing new is written
    r2 = predict_task(llm, tok, "niah_single_1", out, num_samples=2,
                      target_tokens=280, seed=3, verbose=False)
    assert len(open(out).readlines()) == n_lines
    assert r2["n"] == 2
