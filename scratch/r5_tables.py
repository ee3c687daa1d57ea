#!/usr/bin/env python
"""Aggregate round-5 result CSVs into markdown tables for BENCHMARKS.md."""
import csv
import glob
import os
import sys

sys.path.insert(0, "/root/repo")


def ruler_table(root="results/ruler_r5"):
    rows = {}
    tasks = set()
    for summ in sorted(glob.glob(os.path.join(root, "*", "summary.csv"))):
        cfg = os.path.basename(os.path.dirname(summ))
        scores = {}
        with open(summ) as f:
            for r in csv.DictReader(f):
                scores[r["task"]] = r["score"]
                if r["task"] != "average":
                    tasks.add(r["task"])
        rows[cfg] = scores
    if not rows:
        return
    tl = sorted(tasks)
    print("| config | " + " | ".join(tl) + " | avg |")
    print("|---" * (len(tl) + 2) + "|")
    for cfg, sc in rows.items():
        cells = [sc.get(t, "-") for t in tl] + [sc.get("average", "-")]
        print(f"| {cfg} | " + " | ".join(cells) + " |")


def accuracy_table(root="results/accuracy_r5"):
    for name in ("summary.csv", "summary_multiquery.csv", "summary_hop.csv"):
        path = os.path.join(root, name)
        if not os.path.exists(path):
            continue
        print(f"\n### {name}")
        by_ctx = {}
        ests = []
        with open(path) as f:
            for r in csv.DictReader(f):
                by_ctx.setdefault(int(r["context"]), {})[r["estimator"]] = (
                    r["accuracy"], r.get("n", "?"))
                if r["estimator"] not in ests:
                    ests.append(r["estimator"])
        print("| context | " + " | ".join(ests) + " |")
        print("|---" * (len(ests) + 1) + "|")
        for ctx in sorted(by_ctx):
            cells = []
            for e in ests:
                v = by_ctx[ctx].get(e)
                cells.append(f"{v[0]} (n={v[1]})" if v else "-")
            print(f"| {ctx} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    print("## RULER r5")
    ruler_table()
    print("\n## accuracy r5")
    accuracy_table()
