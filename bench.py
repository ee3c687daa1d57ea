#!/usr/bin/env python
"""Headline benchmark: long-context decode throughput per chip.

Mirrors the reference's canonical config (`examples/bench.sh:1`: B=1,
P=98000, M=98304, K=10, L=150) and its headline claim structure: the
reference reports decode throughput vs a *memory-constrained* full-attention
baseline (`README.md:27-35` — the GPU baseline is VRAM-bound, which is the
whole premise of offloading). The TPU equivalent: each mode runs at the
largest batch that fits HBM at 96K context, and we report aggregate
tokens/s/chip.

Modes measured:
  * full       — exact full attention, bf16 KV (the reference-definition
                 baseline; `vs_baseline` is computed against this)
  * full_int8  — exact full attention, int8 dense KV at its own max batch
                 (the strongest dense config this repo supports;
                 `vs_strongest` is computed against this)
  * lsh        — SimHash K10/L150 sampled attention (reference-exact mode)
  * block_topk — TPU-native fast mode: exact-score block-top-k over an int8
                 offload cache (scores every key on the MXU from an int8
                 stream; V gathered for top blocks only)

Each (mode, batch) attempt runs in a fresh subprocess: a TPU OOM poisons the
client (even scalar allocations fail afterwards), so in-process backoff is
impossible. Prints ONE JSON line with the flagship result; per-mode numbers
go to stderr.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def make_lsh(mode, K, L):
    from magicpig_tpu.config import LSHConfig

    if mode == "full":
        return LSHConfig(K=0, L=0)
    if mode == "full_int8":
        # Strongest-baseline row: exact full attention with int8 dense KV at
        # its own max batch. The reference's baseline definition keeps the
        # KV exact (README.md:27-35), but this repo supports int8 dense KV
        # under K=0, so the headline also reports vs_strongest against this
        # config — the honest upper bound a dense user could reach here.
        return LSHConfig(K=0, L=0, dense_quant="int8")
    if mode == "lsh":
        # int8 offload halves the K/V stream the fused kernel reads and the
        # per-request state (planes dominate either way), raising max batch.
        return LSHConfig(K=K, L=L, decode_mode="masked",
                         offload_quant="int8")
    if mode == "block_topk":
        return LSHConfig(K=1, L=0, estimator="block_topk",
                         offload_quant="int8")
    if mode == "block_topk_store":
        # Safety-net config: the round-2 score-store pipeline with int8
        # offload — the exact configuration with a measured history
        # (305.6 tok/s B=5). Auto-run only if every rescore-pipeline mode
        # fails on hardware.
        return LSHConfig(K=1, L=0, estimator="block_topk",
                         offload_quant="int8", block_topk_pipeline="store")
    if mode == "block_topk4":
        # Packed-int4 K (ops/pack4.py): halves the scorer's HBM stream and
        # the off_k state vs int8; V stays int8. The dense layer's KV is
        # int8 too (flash_decode in-register dequant) — at 96K that layer
        # streams 200 MB/request/step in bf16. The full baseline stays
        # exact-KV (the reference's baseline definition).
        return LSHConfig(K=1, L=0, estimator="block_topk",
                         offload_quant="int4", dense_quant="int8")
    raise ValueError(mode)


CACHE_DIR = os.environ.get("MAGICPIG_JAX_CACHE",
                           os.path.join(os.path.dirname(os.path.abspath(
                               __file__)), ".cache", "jax"))


def _enable_compile_cache():
    """Persistent XLA compilation cache, shared across worker subprocesses
    and across bench invocations: a timed-out attempt's completed
    executables are reused by its retry, and a pre-warmed cache makes the
    driver's run compile-free."""
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def worker(args):
    """Measure one (mode, B) in this process; print WORKER:{json}."""
    _enable_compile_cache()
    import dataclasses

    from magicpig_tpu.config import preset
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.runtime.synthetic import synthetic_prefill

    t0 = time.perf_counter()
    # Claim proof: the axon claim can wedge forever at backend init
    # (~50% of processes on 2026-08-21). A trivial device op printed
    # the moment it completes lets the parent distinguish "compiling,
    # leave it alone" from "wedged, kill early" without burning the
    # full attempt timeout.
    import jax
    import jax.numpy as _jnp

    _ = float((_jnp.ones((8, 8)) @ _jnp.ones((8, 8))).sum())
    print(f"# worker[{args.worker}]: claim ok at "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    cfg = preset(args.model)
    wq = args.weight_quant
    if wq != "none":
        cfg = dataclasses.replace(cfg, weight_quant=wq)
    if args.worker == "prefill":
        # Real chunked-prefill wall time at context P (flagship estimator
        # state build included: centering, quant, landmarks/planes).
        lsh = make_lsh("block_topk", args.K, args.L)
        llm = LLM(cfg, batch_size=1, max_length=args.M, lsh=lsh, seed=0,
                  chunk_size=args.chunk)
        rng = np.random.default_rng(0)
        ids = rng.integers(1, cfg.vocab_size, size=args.P).astype(np.int32)
        # DISTINCT timed input: the axon tunnel memoizes identical
        # dispatches (same executable + same args returned in ~us — a
        # round-2c run recorded 65M "tok/s" this way).
        ids2 = rng.integers(1, cfg.vocab_size, size=args.P).astype(np.int32)
        # Scalar FETCH, not block_until_ready: through the axon tunnel the
        # latter can return before the device finishes (the 18.8M "tok/s"
        # artifact in results/hw_r2c/bench_prefill_v2.log); fetching a
        # value forces completion (same finding as scratch/calibrate.py).
        _ = float(np.asarray(llm.prefill(ids))[0, 0])   # compile + run
        print(f"# worker[prefill]: compiled at "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        llm.clear()
        t1 = time.perf_counter()
        _ = float(np.asarray(llm.prefill(ids2))[0, 0])
        dt = time.perf_counter() - t1
        print("WORKER:" + json.dumps({"tps": args.P / dt, "sparsity": 0.0,
                                      "weight_quant": wq}), flush=True)
        return
    lsh = make_lsh(args.worker, args.K, args.L)
    if args.batch_split and args.B > 1:
        lsh = dataclasses.replace(lsh, batch_split=True)
    if wq != "none" and cfg.fuse_small_linears is False and args.fuse:
        cfg = dataclasses.replace(cfg, fuse_small_linears=True)
    llm = LLM(cfg, batch_size=args.B, max_length=args.M, lsh=lsh, seed=0,
              chunk_size=args.chunk)
    synthetic_prefill(llm, args.P, seed=1)
    print(f"# worker[{args.worker} B={args.B}]: fill done at "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    tok = np.zeros((args.B,), np.int32)
    t = llm.decode_steps(tok, args.G)   # compile + warmup (same static shape)
    _ = np.asarray(t)
    print(f"# worker[{args.worker} B={args.B}]: decode compiled at "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    t = llm.decode_steps(tok, args.G)
    _ = np.asarray(t)
    dt = time.perf_counter() - t0
    print("WORKER:" + json.dumps({
        "tps": args.B * args.G / dt,
        "sparsity": float(llm.avg_sparsity),
        "weight_quant": wq,
    }), flush=True)


CLAIM_WINDOW = 1200  # s: claims queue minutes behind prior releases; killing early resets the queue


class ClaimWedge(Exception):
    """Worker never completed its trivial claim-proof device op."""


class _Attempt:
    def __init__(self, stdout, stderr):
        self.stdout, self.stderr = stdout, stderr


def run_attempt(cmd, env, timeout):
    """subprocess.run equivalent with early wedge detection: if the worker
    has not printed its '# claim ok' line within CLAIM_WINDOW, kill it
    (SIGTERM first — a clean exit releases the chip claim; SIGKILL leaves
    it held server-side ~10 min) and raise ClaimWedge instead of burning
    the full attempt timeout."""
    import signal as _signal
    import tempfile

    with tempfile.TemporaryFile(mode="w+") as sout, \
            tempfile.TemporaryFile(mode="w+") as serr:
        p = subprocess.Popen(cmd, stdout=sout, stderr=serr, env=env,
                             text=True, start_new_session=True)

        def _kill():
            try:
                os.killpg(p.pid, _signal.SIGTERM)
            except OSError:
                p.terminate()
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(p.pid, _signal.SIGKILL)
                except OSError:
                    p.kill()
                p.wait()

        t0 = time.time()
        claimed = False
        while True:
            rc = p.poll()
            if rc is not None:
                break
            el = time.time() - t0
            if not claimed:
                serr.seek(0)
                if "claim ok" in serr.read():
                    claimed = True
                elif el > CLAIM_WINDOW:
                    _kill()
                    raise ClaimWedge()
            if el > timeout:
                _kill()
                raise subprocess.TimeoutExpired(cmd, timeout)
            time.sleep(5)
        sout.seek(0)
        serr.seek(0)
        return _Attempt(sout.read(), serr.read())


def analytic_batch(model, mode, K, L, M, hbm_budget, max_b,
                   weight_quant="none"):
    import dataclasses

    import jax

    from magicpig_tpu.config import preset
    from magicpig_tpu.models.llama import init_params
    from magicpig_tpu.runtime import state as state_lib

    cfg = preset(model)
    if weight_quant != "none":
        cfg = dataclasses.replace(cfg, weight_quant=weight_quant)
    lsh = make_lsh(mode, K, L)
    pshapes = jax.eval_shape(lambda: init_params(cfg, jax.random.key(0), M))

    def nbytes(l):
        # int4 packs two elements per byte on TPU; ml_dtypes reports
        # itemsize 1 for s4, so halve it explicitly.
        if "int4" in str(l.dtype):
            return np.prod(l.shape) * 0.5
        return np.prod(l.shape) * l.dtype.itemsize

    pbytes = sum(nbytes(l) for l in jax.tree.leaves(pshapes))
    sshapes = jax.eval_shape(lambda: state_lib.init_state(cfg, lsh, 1, M))
    per_req = sum(np.prod(l.shape) * l.dtype.itemsize
                  for l in jax.tree.leaves(sshapes))
    # All caches store token-folded layouts (lane-perfect, no XLA padding),
    # so the analytic bound is tight up to the decode-step workspace
    # (materialized scores etc.) — which is a whole-graph transient, not a
    # per-request cost; OOM backoff still guards the rest. lsh needs
    # fill-time headroom for the per-chunk plane-build transients: the
    # round-4 B=3 attempt (13.0 GB resident) wedged in fill for 25 min
    # (results/probe_r4/engine_lsh_b3.log) while B=2 filled in 8.
    workspace = (0.8e9 if mode.startswith("block_topk")
                 else 1.2e9 if mode == "lsh" else 0.2e9)
    b = int((hbm_budget - pbytes - workspace) // per_req)
    return min(max(b, 1), max_b), pbytes, per_req, 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llama-3.2-1b")
    p.add_argument("--P", type=int, default=98000)
    p.add_argument("--M", type=int, default=98304)
    p.add_argument("--G", type=int, default=16, help="timed decode steps")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--L", type=int, default=150)
    p.add_argument("--B", type=int, default=0,
                   help="fixed batch for ALL modes (0 = per-mode max batch)")
    p.add_argument("--mode", type=str, default="block_topk4",
                   choices=["block_topk", "block_topk4", "block_topk_store",
                            "lsh", "full", "full_int8", "prefill"],
                   help="flagship mode for the headline JSON")
    p.add_argument("--modes", type=str,
                   default="full,full_int8,block_topk4,block_topk,lsh",
                   help="comma list of modes to measure")
    p.add_argument("--hbm-gb", type=float, default=13.5)
    p.add_argument("--chunk", type=int, default=8192,
                   help="prefill chunk tokens; bigger chunks re-read the "
                        "weights fewer times (P/chunk passes) at the cost "
                        "of a ~C*S*Hq*4B/8192 attention transient")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--baseline-tps", type=float, default=0.0,
                   help="inject a previously-measured full-attention tok/s")
    p.add_argument("--weight-quant", type=str, default="int8",
                   choices=["none", "int8", "int4"],
                   help="int8 (default) = W8A8 weights for EVERY mode, "
                        "baseline included — the equal-format comparison "
                        "(flagship 305.6 vs dense 174.0 tok/s at 96K); "
                        "int4 = W4A8 grouped weights (halves the weight "
                        "stream again; the 8B@96K single-chip config); "
                        "none = bf16 weights everywhere")
    p.add_argument("--attempt-timeout", type=int, default=1800)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--worker", type=str, default=None, help=argparse.SUPPRESS)
    p.add_argument("--batch-split", action="store_true",
                   help="per-request pallas grids in the fused LSH kernel "
                        "(auto-retry fallback for batched-compile crashes)")
    p.add_argument("--fuse", type=int, default=1,
                   help="1 = fuse qkv/gate-up into single quantized "
                        "matmuls (single-chip decode; bitwise-equal math)")
    args = p.parse_args()
    if args.quick:
        args.P, args.M, args.G = 16000, 16384, 8
        args.max_batch = 2

    if args.worker:
        worker(args)
        return

    wanted = args.modes.split(",") + [args.mode]
    # prefill is B=1 by construction

    # Same threshold as the use site (vs_baseline uses baseline_tps only
    # when > 1): for 0 < baseline_tps <= 1 a fresh full row must still be
    # measured or vs_baseline would silently become null.
    if args.baseline_tps <= 1 and args.mode not in ("full", "prefill"):
        wanted.append("full")
    modes = list(dict.fromkeys(m for m in wanted if m))

    print(f"# bench: {args.model} ctx={args.P} M={args.M} G={args.G}",
          file=sys.stderr)

    # Pre-flight: a healthy chip claims + compiles a trivial op in ~2 s; a
    # wedged axon pool hangs the claim forever (inside `import jax`, via
    # sitecustomize). Without this check every per-mode attempt would burn
    # its full --attempt-timeout on the hang — hours for nothing. 300 s is
    # ~100x the healthy claim time.
    # The claim itself wedges ~50% of processes some nights (2026-08-21):
    # one failed probe is a lottery loss, not chip death — abort only
    # after several independent probes fail.
    for _pf in range(4):
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print((jnp.ones((128,128), jnp.bfloat16) @ "
                 "jnp.ones((128,128), jnp.bfloat16)).sum())"],
                capture_output=True, timeout=150, check=True)
            _pf = -1
            break
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            print(f"# pre-flight probe {_pf} failed "
                  f"({type(e).__name__}); retrying", file=sys.stderr)
            time.sleep(20)
    if _pf != -1:
        print(f"# pre-flight failed 4x: TPU claim/compile is not healthy; "
              f"aborting without burning attempt timeouts", file=sys.stderr)
        print(json.dumps({"metric": "decode_throughput", "value": 0,
                          "unit": "tokens/s/chip", "vs_baseline": None,
                          "note": "TPU claim wedged at bench time; "
                                  "measured numbers in BENCHMARKS.md"}))
        return

    results = {}
    skips = {}      # mode -> why no row was recorded (surfaced in the JSON)
    ceilings = {}   # mode -> analytic tok/s ceiling (sanity bound)

    # Env-poisoning signatures (infra flakes, NOT model failures): round 2
    # lost the lsh B=2 row to a TPU_WORKER_HOSTNAMES claim flake and the
    # backoff silently shrank the batch. These retry at the SAME batch.
    INFRA_SIGS = ("TPU_WORKER_HOSTNAMES", "unexpected worker hostname",
                  "Failed to claim", "failed to claim")

    def preflight_healthy():
        """Quick chip health check (same op as the startup pre-flight).
        Runs under the scrubbed worker env: a poisoned orchestration var
        must not make a healthy chip look wedged (the workers it gates run
        scrubbed too)."""
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print((jnp.ones((128,128), jnp.bfloat16) @ "
                 "jnp.ones((128,128), jnp.bfloat16)).sum())"],
                capture_output=True, timeout=300, check=True,
                env=worker_env())
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            return False

    def worker_env():
        """Scrubbed env for worker subprocesses: drop TPU pod-orchestration
        vars whose values are visibly poisoned (the round-2 flake injected a
        WARNING string into TPU_WORKER_HOSTNAMES)."""
        env = dict(os.environ)
        for var in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID"):
            val = env.get(var, "")
            if val and (" " in val or "WARNING" in val):
                env.pop(var, None)
        return env

    def measure(mode, weight_quant=None):
        wq = args.weight_quant if weight_quant is None else weight_quant
        _, pbytes, per_req, _ = analytic_batch(
            args.model, "block_topk" if mode == "prefill" else mode,
            args.K, args.L, args.M, args.hbm_gb * 1e9, args.max_batch,
            weight_quant=wq)
        if mode == "prefill" or args.B > 0:
            B = max(args.B, 1)
        else:
            B = analytic_batch(args.model, mode, args.K, args.L, args.M,
                               args.hbm_gb * 1e9, args.max_batch,
                               weight_quant=wq)[0]
            print(f"# {mode}: params {pbytes/1e9:.2f} GB, state/req "
                  f"{per_req/1e9:.2f} GB -> B={B}", file=sys.stderr)
        if mode == "prefill":
            # FLOP ceiling: ~2*n_params MACs/token on a ~197 Tflop/s chip.
            n_params = pbytes / {"none": 2.0, "int8": 1.0, "int4": 0.55}[wq]
            ceilings[mode] = 197e12 / max(2 * n_params, 1)
        else:
            # Per-batch-unit HBM ceiling: every decode step must at least
            # re-read the weights once (x B at the check site).
            ceilings[mode] = 819e9 / max(pbytes, 1)
        retried = False
        infra_retries = 0
        mosaic_strikes = 0
        backend_retries = 0
        wedge_retries = 0
        batch_split = False
        while B >= 1:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--worker", mode, "--B", str(B)]
            for flag, val in (("--model", args.model), ("--P", args.P),
                              ("--M", args.M), ("--G", args.G),
                              ("--K", args.K), ("--L", args.L),
                              ("--chunk", args.chunk),
                              ("--weight-quant", wq),
                              ("--fuse", args.fuse)):
                cmd += [flag, str(val)]
            if batch_split:
                cmd += ["--batch-split"]
            try:
                out = run_attempt(cmd, worker_env(), args.attempt_timeout)
            except ClaimWedge:
                # Backend-init hang, not a property of (mode, B). A
                # SIGKILLed claim stays held server-side ~10 min and
                # poisons immediate retries — probe with a trivial op
                # until the pool answers, THEN relaunch the same batch.
                wedge_retries += 1
                if wedge_retries <= 4:
                    print(f"# {mode}: B={B} claim wedge (no device op in "
                          f"{CLAIM_WINDOW}s); probing pool before retry "
                          f"({wedge_retries}/4)", file=sys.stderr)
                    time.sleep(120)   # let the killed claim's release drain
                    for probe in range(6):
                        if preflight_healthy():
                            print(f"# {mode}: pool answered (probe "
                                  f"{probe}); relaunching B={B}",
                                  file=sys.stderr)
                            break
                        print(f"# {mode}: pool probe {probe} silent; "
                              f"waiting", file=sys.stderr)
                        time.sleep(30)
                    continue
                skips.setdefault(mode, "persistent claim wedge")
                print(f"# {mode}: persistent claim wedge; giving up mode",
                      file=sys.stderr)
                break
            except subprocess.TimeoutExpired:
                # The persistent compile cache keeps every executable the
                # attempt finished building; one retry at the SAME batch
                # resumes from there instead of giving up the config.
                if not retried:
                    print(f"# {mode}: B={B} timed out; retrying with warm "
                          f"compile cache", file=sys.stderr)
                    retried = True
                else:
                    print(f"# {mode}: B={B} timed out", file=sys.stderr)
                    B -= 1
                    retried = False
                continue
            for ln in (out.stderr or "").splitlines():
                if ln.startswith("# worker"):   # phase timings
                    print(ln, file=sys.stderr)
            line = next((ln for ln in out.stdout.splitlines()
                         if ln.startswith("WORKER:")), None)
            if line:
                r = json.loads(line[len("WORKER:"):])
                ceil = ceilings.get(mode)
                if ceil and mode != "prefill":
                    ceil *= B
                if ceil and r["tps"] > 10 * ceil:
                    # Row-level sanity bound: a tok/s more than 10x the
                    # analytic HBM/FLOP ceiling is a timing artifact (the
                    # 18.8M "tok/s" prefill row of bench_prefill_v2.log),
                    # not a measurement. Record the skip, not the number.
                    skips[mode] = (f"implausible {r['tps']:.0f} tok/s "
                                   f"(> 10x analytic ceiling {ceil:.0f})")
                    print(f"# {mode}: B={B} REJECTED: {skips[mode]}",
                          file=sys.stderr)
                    break
                results[mode] = (r["tps"], B, r["sparsity"],
                                 r.get("weight_quant", wq))
                print(f"# {mode}: B={B} -> {r['tps']:.3f} tok/s/chip "
                      f"(sparsity {r['sparsity']:.4f}, "
                      f"W={r.get('weight_quant', wq)})", file=sys.stderr)
                break
            stderr = out.stderr or ""
            diag = f"/tmp/bench_worker_{mode}_B{B}.log"
            with open(diag, "w") as f:
                f.write(stderr)
            lines = [ln for ln in stderr.splitlines()
                     if "Error" in ln or "error" in ln][-2:]
            print(f"# {mode}: B={B} failed ({'; '.join(lines)[:300]}) "
                  f"[full log: {diag}]", file=sys.stderr)
            is_mosaic = ("MosaicError" in stderr
                         or "Mosaic failed to compile" in stderr)
            is_oom = (("RESOURCE_EXHAUSTED" in stderr
                       and "out of memory" in stderr.lower())
                      # Remote-compile HBM overflow surfaces as an HTTP 500
                      # from tpu_compile_helper with this text — and with
                      # benign TPU_WORKER_HOSTNAMES noise around it that the
                      # INFRA_SIGS check would otherwise misread as a claim
                      # flake (the round-5 lsh B=2 row was lost to exactly
                      # that: a compile OOM retried twice as "infra" then
                      # the whole mode given up instead of shrinking B).
                      or "Ran out of memory in memory space hbm" in stderr
                      or "Exceeded hbm capacity" in stderr)
            # Check Mosaic/OOM FIRST: the remote compile helper's log spews
            # benign libtpu-init warnings (TPU_WORKER_HOSTNAMES et al.)
            # around the REAL kernel error, so infra signatures only count
            # when no kernel failure is present.
            if (not is_mosaic and not is_oom
                    and any(sig in stderr for sig in INFRA_SIGS)):
                # Environment/claim flake — nothing about (mode, B) failed.
                # Retry at the SAME batch instead of shrinking it.
                infra_retries += 1
                if infra_retries <= 2:
                    print(f"# {mode}: infra flake (claim/env); retrying "
                          f"B={B} ({infra_retries}/2)", file=sys.stderr)
                    time.sleep(20 * infra_retries)
                    continue
                print(f"# {mode}: persistent infra failure; giving up mode",
                      file=sys.stderr)
                break
            if is_mosaic:
                if mode == "lsh" and B > 1 and not batch_split:
                    # The batched fused-LSH grid has a history of remote
                    # tpu_compile_helper crashes (round 2); the per-request
                    # split is the same program per slice. Retry the SAME
                    # batch split before shrinking it.
                    batch_split = True
                    print(f"# {mode}: Mosaic/compile failure at B={B}; "
                          f"retrying with per-request batch_split",
                          file=sys.stderr)
                    continue
                # Kernel-lowering failures are usually batch-independent,
                # but some VMEM/resource errors scale with B: allow ONE
                # smaller-B attempt before abandoning the mode (the
                # sparse-mode fallback ladder still runs after that).
                mosaic_strikes += 1
                if mosaic_strikes >= 2:
                    skips.setdefault(mode, "Mosaic compile failure")
                    print(f"# {mode}: repeated Mosaic compile failure; "
                          f"abandoning mode", file=sys.stderr)
                    break
                print(f"# {mode}: Mosaic compile failure; one smaller-B "
                      f"attempt before abandoning", file=sys.stderr)
                B -= 1
                retried = False
                continue
            if is_oom:
                if B <= 1:
                    # A mode whose B=1 does not fit is a capacity fact, not
                    # a zero-throughput measurement: skip with a note
                    # (round-3 weak #9 — bench_3b_v2.log recorded a
                    # value-0 row here).
                    skips[mode] = (f"B=1 does not fit HBM at this "
                                   f"model/context (RESOURCE_EXHAUSTED)")
                    print(f"# {mode}: {skips[mode]}", file=sys.stderr)
                    break
                B -= 1
                retried = False
                continue
            if ("FAILED_PRECONDITION" in stderr
                    or "RESOURCE_EXHAUSTED" in stderr):
                # 'TPU backend error' class: the round-3 driver run lost
                # block_topk B=5/4/3 to FAILED_PRECONDITION flakes that a
                # same-day run at the same batch passed. If the chip still
                # answers a trivial preflight, nothing about (mode, B)
                # failed — retry at the SAME batch before shrinking.
                backend_retries += 1
                if backend_retries <= 2 and preflight_healthy():
                    print(f"# {mode}: TPU backend flake with healthy "
                          f"preflight; retrying B={B} "
                          f"({backend_retries}/2)", file=sys.stderr)
                    time.sleep(15 * backend_retries)
                    continue
                print(f"# {mode}: backend error persists (or chip "
                      f"unhealthy); shrinking batch", file=sys.stderr)
            B -= 1
            retried = False
        if mode not in results:
            skips.setdefault(mode, "no batch fit / all attempts failed")
            print(f"# {mode}: no batch fit", file=sys.stderr)

    for mode in modes:
        measure(mode)
    if "lsh" in modes and "lsh" not in results and args.weight_quant != "none":
        # lsh's measured history is bf16 weights; if the quantized-weight
        # run failed at every batch, record the bf16 row (self-described by
        # its weight_quant field) rather than no lsh row at all.
        print("# lsh: retrying with bf16 weights (measured-history config)",
              file=sys.stderr)
        measure("lsh", weight_quant="none")
    sparse = [m for m in modes if m not in ("full", "full_int8", "prefill")]
    if sparse and not any(m in results for m in sparse):
        # Every rescore-pipeline mode failed (e.g. a Mosaic lowering
        # regression on this round's toolchain): fall back to the
        # measured-history score-store pipeline so the round still
        # records a real number.
        print("# all sparse modes failed; trying block_topk_store "
              "fallback", file=sys.stderr)
        measure("block_topk_store")

    flag = results.get(args.mode)
    head_mode = args.mode
    if args.mode not in ("full", "full_int8", "prefill"):
        # Headline = the FASTEST measured sparse mode (honestly labeled in
        # the metric name). --mode is the preferred candidate, but a mode
        # that regressed on this round's toolchain must not drag the
        # recorded number below what another measured config achieves.
        cands = [(m, r) for m, r in results.items()
                 if m not in ("full", "full_int8", "prefill")]
        if cands:
            best_mode, best = max(cands, key=lambda kv: kv[1][0])
            if flag is None:
                print(f"# headline fallback: {args.mode} failed, reporting "
                      f"{best_mode}", file=sys.stderr)
                head_mode, flag = best_mode, best
            elif best[0] > flag[0]:
                print(f"# headline: {best_mode} ({best[0]:.1f} tok/s) beats "
                      f"--mode {args.mode} ({flag[0]:.1f})", file=sys.stderr)
                head_mode, flag = best_mode, best
    # Baseline semantics: --baseline-tps <= 1 means "no in-run baseline
    # exists" (round-3 weak #6: a 3B run with --baseline-tps 1 emitted
    # vs_baseline 24.3 against nothing). vs_baseline is null in that case.
    base_tps = (args.baseline_tps if args.baseline_tps > 1
                else results.get("full", (0, 0, 0))[0])
    if flag is None:
        print(json.dumps({"metric": "decode_throughput", "value": 0,
                          "unit": "tokens/s/chip", "vs_baseline": None,
                          "note": "no mode produced a measurement",
                          "skipped": skips}))
        return
    if head_mode == "prefill":
        # Prefill tok/s has no decode baseline to ratio against
        # (round-3 weak #5: category-confused vs_baseline 25.676).
        out = {
            "metric": f"prefill_throughput_{args.model}_ctx{args.P}",
            "value": round(flag[0], 3),
            "unit": "prefill_tokens/s/chip",
            "vs_baseline": None,
        }
    else:
        out = {
            "metric": (f"decode_throughput_{args.model}_ctx{args.P}_"
                       f"{head_mode}_maxbatch"),
            "value": round(flag[0], 3),
            "unit": "tokens/s/chip",
            "vs_baseline": (round(flag[0] / base_tps, 3) if base_tps
                            else None),
        }
        strongest = results.get("full_int8", (0,))[0]
        if strongest:
            # Ratio against the strongest dense config this repo supports
            # (full attention + int8 dense KV at its own max batch) —
            # stricter than the reference-definition baseline above.
            out["vs_strongest"] = round(flag[0] / strongest, 3)
    # Per-mode rows, self-describing (tps, batch, sparsity, weight format).
    out["rows"] = {m: {"tps": round(r[0], 3), "B": r[1],
                       "sparsity": round(r[2], 4), "weight_quant": r[3]}
                   for m, r in sorted(results.items())}
    if skips:
        out["skipped"] = skips
    print(json.dumps(out))


if __name__ == "__main__":
    main()
