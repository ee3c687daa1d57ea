"""Shared microbench harness for the axon TPU tunnel.

Rules learned the hard way:
  * the tunnel memoizes (executable, args) -> result: EVERY timed call must
    have at least one distinct input arg;
  * block_until_ready can return at enqueue: only a host fetch truly waits;
  * ~30 ms RTT per fetch: enqueue all n calls, fetch once, subtract RTT.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

_small = jax.jit(lambda x: x + 1)


def measure_rtt(n=20):
    np.asarray(_small(jnp.zeros((), jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(_small(jnp.zeros((), jnp.int32)))
    return (time.perf_counter() - t0) / n


RTT = None


def timeit(name, fn, variants, bytes_=None, flops=None):
    """variants: list of arg tuples, ALL UNIQUE; n = len(variants) - 1
    (variant 0 is warmup only)."""
    global RTT
    if RTT is None:
        RTT = measure_rtt()
        print(f"RTT per fetch: {RTT*1e3:.2f} ms")
    red = jax.jit(lambda r: jax.tree.leaves(r)[0].ravel()[0])
    np.asarray(red(fn(*variants[0])))
    n = len(variants) - 1
    t0 = time.perf_counter()
    r = None
    for i in range(1, len(variants)):
        r = fn(*variants[i])
    np.asarray(red(r))
    dt = (time.perf_counter() - t0 - RTT) / n
    extra = ""
    if bytes_:
        extra += f"  {bytes_/dt/1e9:8.1f} GB/s"
    if flops:
        extra += f"  {flops/dt/1e12:8.2f} TF/s"
    print(f"{name:48s} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt
