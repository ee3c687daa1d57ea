"""Calibrated microbench v3.

Two axon-tunnel gotchas handled:
  * result memoization on repeated identical (executable, args) — defeated by
    pre-staging n distinct input variants;
  * block_until_ready returning at enqueue time — defeated by fetching a
    scalar of the final result to host (np.asarray), which truly waits.
Timing: enqueue n varied calls back-to-back, fetch last scalar; per-call cost
= (total - RTT) / n with RTT measured on a trivial op.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
print(jax.devices())

_small = jax.jit(lambda x: x + 1)
_s0 = jnp.zeros((), jnp.int32)


def measure_rtt():
    np.asarray(_small(_s0))
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(_small(_s0))
    return (time.perf_counter() - t0) / 20


RTT = measure_rtt()
print(f"RTT per fetch: {RTT*1e3:.3f} ms")


def timeit(name, fn, variants, n=8, bytes_=None, flops=None, reduce_out=True):
    """variants: list of arg-tuples (>= 2 distinct). Enqueue n calls cycling
    through variants, fetch a scalar from the last result only."""
    red = jax.jit(lambda r: jax.tree.leaves(r)[0].ravel()[0])
    np.asarray(red(fn(*variants[0])))  # compile + warm
    np.asarray(red(fn(*variants[1 % len(variants)])))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = fn(*variants[i % len(variants)])
    np.asarray(red(r))
    dt = (time.perf_counter() - t0 - RTT) / n
    extra = ""
    if bytes_:
        extra += f"  {bytes_/dt/1e9:8.1f} GB/s"
    if flops:
        extra += f"  {flops/dt/1e12:8.2f} TF/s"
    print(f"{name:44s} {dt*1e3:8.3f} ms{extra}")
    return dt


def mk(shape, dtype, lo=None, hi=None, nv=4):
    outs = []
    for _ in range(nv):
        if lo is not None:
            outs.append(jnp.asarray(rng.integers(lo, hi, shape), dtype))
        else:
            outs.append(jnp.asarray(rng.standard_normal(shape), dtype))
    return outs


# --- calibration -------------------------------------------------------------
xs = mk((8, 150, 96 * 1024), jnp.int16, 0, 100)
timeit("sum 236MB int16", jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32)),
       [(x,) for x in xs], bytes_=xs[0].size * 2)

aa = mk((8192, 8192), jnp.bfloat16)
timeit("matmul 8192^3 bf16", jax.jit(lambda a, b: a @ b),
       [(aa[i], aa[(i + 1) % 4]) for i in range(4)], flops=2 * 8192**3)

# --- contenders --------------------------------------------------------------
S = 96 * 1024
HQ, HKV, G, L, K, D = 32, 8, 4, 150, 10, 64
W = S // 32

kcs = mk((HKV, L, S), jnp.int16, 0, 1 << K, nv=2)
qcs = mk((HQ, L), jnp.int16, 0, 1 << K, nv=4)


@jax.jit
def mask_int16(qc, kc):
    qcr = qc.reshape(HKV, G, L, 1)
    cnt = jnp.sum((qcr == kc[:, None]).astype(jnp.int16), axis=2,
                  dtype=jnp.int16)
    return cnt >= 2


timeit("int16 code-compare mask", mask_int16,
       [(qcs[i % 4], kcs[i % 2]) for i in range(4)],
       bytes_=kcs[0].size * 2)

pls = mk((HKV, L, K, W), jnp.int32, -(1 << 31), (1 << 31) - 1, nv=2)
qbs = mk((HQ, L, K), jnp.int32, 0, 2, nv=4)


@jax.jit
def mask_planes(qb, pl):
    qsel = (qb - 1).reshape(HKV, G, L, K, 1)
    m = pl[:, None] ^ qsel
    m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (3,))
    aa = jnp.zeros((HKV, G, W), jnp.int32)
    bb = jnp.zeros((HKV, G, W), jnp.int32)

    def body(l, ab):
        a, b = ab
        ml = jax.lax.dynamic_index_in_dim(m, l, 2, keepdims=False)
        return (a | ml, b | (a & ml))

    aa, bb = jax.lax.fori_loop(0, L, body, (aa, bb))
    return bb


timeit("bit-plane scan mask", mask_planes,
       [(qbs[i % 4], pls[i % 2]) for i in range(4)],
       bytes_=pls[0].size * 4)

cds = mk((HQ, 19200), jnp.int32, 0, S, nv=4)
timeit("sort [32,19200] int32", jax.jit(lambda c: jnp.sort(c, axis=-1)),
       [(c,) for c in cds])

m8s = [jnp.asarray(rng.random((HKV, S)) < 0.08, jnp.int8) for _ in range(4)]
BUDGET = 8192
timeit("top_k [8,96K] k=8192 int8",
       jax.jit(lambda m: jax.lax.top_k(m, BUDGET)[1]), [(m,) for m in m8s])

mfs = [jnp.asarray(rng.random((HKV, S)), jnp.float32) for _ in range(4)]
timeit("approx_max_k [8,96K] k=8192",
       jax.jit(lambda m: jax.lax.approx_max_k(m, BUDGET)[1]),
       [(m,) for m in mfs])

m32s = [jnp.asarray(rng.random((HQ, S)) < 0.03, jnp.int8) for _ in range(4)]
timeit("top_k [32,96K] k=6144 int8 (current)",
       jax.jit(lambda m: jax.lax.top_k(m, 6144)[1]), [(m,) for m in m32s])

kvs = mk((HKV, S, D), jnp.bfloat16, nv=2)
idss = mk((HKV, BUDGET), jnp.int32, 0, S, nv=4)
timeit("gather [8]x8192 rows of [96K,64]",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii])(kc, i)),
       [(kvs[i % 2], idss[i % 4]) for i in range(4)],
       bytes_=HKV * BUDGET * D * 2)

ids6 = mk((HQ, 6144), jnp.int32, 0, S, nv=4)
timeit("gather [32]x6144 rows (current)",
       jax.jit(lambda kc, i: jax.vmap(lambda c, ii: c[ii.reshape(-1)])(
           kc, i.reshape(HKV, G, -1))),
       [(kvs[i % 2], ids6[i % 4]) for i in range(4)],
       bytes_=HQ * 6144 * D * 2)

qs = mk((1, HQ, D), jnp.bfloat16, nv=4)
kc4s = [k[None] for k in kvs]


@jax.jit
def dense_partial(q, k, v):
    qh = q.reshape(1, HKV, G, D)
    s = jnp.einsum("bhgd,bhsd->bhgs", qh, k,
                   preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    o = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o / jnp.sum(p, axis=-1, keepdims=True)


timeit("dense decode partial 96Kxd64 (1 layer)", dense_partial,
       [(qs[i % 4], kc4s[i % 2], kc4s[(i + 1) % 2]) for i in range(4)],
       bytes_=2 * kvs[0].size * 2)
