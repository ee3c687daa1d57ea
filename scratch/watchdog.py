#!/usr/bin/env python
"""Wedge watchdog: run a command, kill + relaunch it if its progress files
stop growing.

The axon TPU tunnel has a known failure mode where a process's dispatch
wedges forever (claim succeeds, first program never returns; the round-5
first leg lost phase D to it). Every long chip job here is resumable
(prediction-file resume in ruler_eval / estimator_accuracy, partial-ckpt
resume in train_needle), so the correct response to a wedge is: kill the
exact process group we started and relaunch.

Progress = total size + max mtime over the watch globs AND the child's
own stdout log. Stall timeout should comfortably exceed the worst
legitimate silent period (first-compile ~3-5 min on this tunnel).

Usage:
  python scratch/watchdog.py --stall 480 --retries 4 --log out.log \
      --watch 'results/ruler_r5/**/*.jsonl' -- python examples/ruler_eval.py ...
"""
import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def progress_stamp(patterns, log_path):
    size, mtime = 0, 0.0
    paths = []
    for pat in patterns:
        paths.extend(glob.glob(pat, recursive=True))
    if log_path:
        paths.append(log_path)
    for p in paths:
        try:
            st = os.stat(p)
        except OSError:
            continue
        size += st.st_size
        mtime = max(mtime, st.st_mtime)
    return size, mtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall", type=float, default=480,
                    help="seconds without progress before kill+retry")
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=10800,
                    help="overall wall budget across all attempts")
    ap.add_argument("--log", type=str, required=True,
                    help="child stdout+stderr log (append; also watched)")
    ap.add_argument("--watch", type=str, nargs="*", default=[],
                    help="progress globs (recursive)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given"

    t_start = time.time()
    for attempt in range(args.retries + 1):
        if time.time() - t_start > args.timeout:
            print(f"[watchdog] overall timeout after {attempt} attempts",
                  flush=True)
            return 124
        with open(args.log, "a") as lf:
            lf.write(f"\n[watchdog] attempt {attempt} "
                     f"{time.strftime('%H:%M:%S')}\n")
            lf.flush()
            proc = subprocess.Popen(cmd, stdout=lf, stderr=lf,
                                    start_new_session=True)
        last = progress_stamp(args.watch, args.log)
        last_t = time.time()
        wedged = False
        while True:
            try:
                rc = proc.wait(timeout=20)
                if rc == 0:
                    print(f"[watchdog] done rc=0 attempt={attempt} "
                          f"({time.time()-t_start:.0f}s)", flush=True)
                    return 0
                print(f"[watchdog] child rc={rc}; retrying", flush=True)
                break
            except subprocess.TimeoutExpired:
                pass
            now = progress_stamp(args.watch, args.log)
            t = time.time()
            if now != last:
                last, last_t = now, t
            elif t - last_t > args.stall:
                wedged = True
            if wedged or t - t_start > args.timeout:
                why = "stall" if wedged else "overall timeout"
                print(f"[watchdog] {why} after {t-last_t:.0f}s silent; "
                      f"killing pgid {proc.pid}", flush=True)
                # SIGTERM first: a clean client exit releases the chip
                # claim server-side. SIGKILL leaves the claim held until
                # a server timeout, which poisons (wedges) the NEXT
                # process's claim — observed three-in-a-row on 2026-08-21.
                try:
                    os.killpg(proc.pid, signal.SIGTERM)
                except OSError:
                    proc.terminate()
                try:
                    proc.wait(timeout=20)
                except subprocess.TimeoutExpired:
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except OSError:
                        proc.kill()
                    proc.wait()
                break
        if not wedged and time.time() - t_start > args.timeout:
            return 124
        # Don't burn a stall window on a poisoned claim: probe with a
        # trivial chip program until it answers, THEN relaunch.
        for i in range(20):
            try:
                subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; "
                     "print((jnp.ones((128,128), jnp.bfloat16) @ "
                     "jnp.ones((128,128), jnp.bfloat16)).sum())"],
                    capture_output=True, timeout=120, check=True)
                print(f"[watchdog] chip preflight ok (try {i})", flush=True)
                break
            except (subprocess.TimeoutExpired,
                    subprocess.CalledProcessError):
                print(f"[watchdog] chip preflight failed (try {i}); "
                      f"waiting", flush=True)
                time.sleep(15)
        time.sleep(5)
    print(f"[watchdog] retries exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
