import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices())
rng = np.random.default_rng(0)
NSTEP = 128
B, HKV = 4, 8
S = 96 * 1024
kq = jnp.asarray(rng.integers(-127, 127, (B, HKV, S // 2, 128)), jnp.int8)
qs = jnp.asarray(rng.standard_normal((NSTEP, 8)), jnp.float32)


def _kernel_stream(k_ref, o_ref):
    k = k_ref[0, 0]
    o_ref[0, 0] = jnp.sum(k.astype(jnp.float32), axis=0,
                          keepdims=True).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("rows",))
def stream_only(q, k, rows=16384):
    b, hkv, s2, lane = k.shape
    out = pl.pallas_call(
        _kernel_stream,
        grid=(b, hkv, s2 // rows),
        in_specs=[pl.BlockSpec((1, 1, rows, lane),
                               lambda b, h, c: (b, h, c, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, lane), lambda b, h, c: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, 1, lane), jnp.float32),
    )(k)
    return out + q.ravel()[0] * 0


def scan_time(name, step_fn, qs_stack, *ops, n=NSTEP, bytes_=None):
    @jax.jit
    def run(qs, *ops):
        def body(carry, q):
            out = step_fn(q, *ops)
            return carry, jax.tree.leaves(out)[0].ravel()[0]
        _, outs = jax.lax.scan(body, 0, qs)
        return outs.sum()
    np.asarray(run(qs_stack, *ops))
    q2 = qs_stack + 1e-3
    t0 = time.perf_counter()
    np.asarray(run(q2, *ops))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:44s} {dt*1e3:8.3f} ms{extra}", flush=True)


for rows in (8192, 16384, 32768):
    scan_time(f"stream int8 rows{rows}",
              lambda q, k, r=rows: stream_only(q, k, rows=r),
              qs, kq, bytes_=kq.size)
kqb = (kq.astype(jnp.bfloat16) * 1.0).astype(jnp.bfloat16)
for rows in (8192, 16384):
    scan_time(f"stream bf16 rows{rows}",
              lambda q, k, r=rows: stream_only(q, k, rows=r),
              qs, kqb, bytes_=kqb.size * 2)


GF = 8

def _kernel_nodot(k_ref, o_ref):
    k = k_ref[0, 0]                      # [rows, 128] int8
    rows = k.shape[0]
    r = jnp.sum(k[:, :GF].astype(jnp.float32), axis=1)  # [rows]
    o_ref[0, 0] = jnp.broadcast_to(r[None, :], (GF, rows))


def _kernel_dot_nostore(k_ref, o_ref):
    k = k_ref[0, 0]
    q2 = jnp.full((GF, 128), 0.5, jnp.bfloat16)
    raw = jax.lax.dot_general(q2, k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = raw[:, :128]           # store only a sliver


@functools.partial(jax.jit, static_argnames=("rows", "which"))
def probe(q, k, rows=16384, which="nodot"):
    b, hkv, s2, lane = k.shape
    kern = _kernel_nodot if which == "nodot" else _kernel_dot_nostore
    ow = rows if which == "nodot" else 128
    om = (lambda b, h, c: (b, h, 0, c)) if which == "nodot" else (
        lambda b, h, c: (b, h, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(b, hkv, s2 // rows),
        in_specs=[pl.BlockSpec((1, 1, rows, lane),
                               lambda b, h, c: (b, h, c, 0))],
        out_specs=pl.BlockSpec((1, 1, GF, ow), om),
        out_shape=jax.ShapeDtypeStruct(
            (b, hkv, GF, s2 if which == "nodot" else 128), jnp.float32),
    )(k)
    return out + q.ravel()[0] * 0


scan_time("nodot+fullstore int8 rows16384",
          lambda q, k: probe(q, k, rows=16384, which="nodot"),
          qs, kq, bytes_=kq.size)
scan_time("dot+nostore int8 rows16384",
          lambda q, k: probe(q, k, rows=16384, which="dot"),
          qs, kq, bytes_=kq.size)


def _kernel_dot_store(k_ref, o_ref):
    k = k_ref[0, 0]
    q2 = jnp.full((GF, 128), 0.5, jnp.bfloat16)
    raw = jax.lax.dot_general(q2, k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = raw                    # full [GF, rows] store


@functools.partial(jax.jit, static_argnames=("rows",))
def probe2(q, k, rows=16384):
    b, hkv, s2, lane = k.shape
    out = pl.pallas_call(
        _kernel_dot_store,
        grid=(b, hkv, s2 // rows),
        in_specs=[pl.BlockSpec((1, 1, rows, lane),
                               lambda b, h, c: (b, h, c, 0))],
        out_specs=pl.BlockSpec((1, 1, GF, rows), lambda b, h, c: (b, h, 0, c)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, GF, s2), jnp.float32),
    )(k)
    return out + q.ravel()[0] * 0


scan_time("dot+fullstore int8 rows16384",
          lambda q, k: probe2(q, k, rows=16384),
          qs, kq, bytes_=kq.size)


def _kernel_v3(q_ref, k_ref, o_ref):
    k = k_ref[0, 0]
    q2 = q_ref[0, 0]
    raw = jax.lax.dot_general(q2, k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = raw


def _kernel_v4(q_ref, k_ref, sc_ref, o_ref):
    k = k_ref[0, 0]
    q2 = q_ref[0, 0]
    raw = jax.lax.dot_general(q2, k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sc = sc_ref[0, 0]                     # [fold, rows]
    s8 = jnp.concatenate([sc[f:f + 1] for f in (0, 1) for _ in range(4)],
                         axis=0)
    o_ref[0, 0] = raw * s8


@functools.partial(jax.jit, static_argnames=("rows", "version"))
def probe3(q, k, sc, rows=16384, version=3):
    b, hkv, s2, lane = k.shape
    q2 = jnp.zeros((b, hkv, GF, 128), jnp.bfloat16) + q.ravel()[0].astype(jnp.bfloat16)
    ins = [q2, k]
    specs = [pl.BlockSpec((1, 1, GF, 128), lambda b, h, c: (b, h, 0, 0)),
             pl.BlockSpec((1, 1, rows, lane), lambda b, h, c: (b, h, c, 0))]
    kern = _kernel_v3
    if version == 4:
        ins.append(sc)
        specs.append(pl.BlockSpec((1, 1, 2, rows), lambda b, h, c: (b, h, 0, c)))
        kern = _kernel_v4
    out = pl.pallas_call(
        kern,
        grid=(b, hkv, s2 // rows),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, GF, rows), lambda b, h, c: (b, h, 0, c)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, GF, s2), jnp.float32),
    )(*ins)
    return out


scf = jnp.asarray(rng.standard_normal((B, HKV, 2, S // 2)), jnp.float32)
scan_time("v3 +q2 input rows16384",
          lambda q, k: probe3(q, k, None, rows=16384, version=3),
          qs, kq, bytes_=kq.size)
scan_time("v4 +scale input+mult rows16384",
          lambda q, k, sc: probe3(q, k, sc, rows=16384, version=4),
          qs, kq, scf, bytes_=kq.size)


def _kernel_v5(q_hbm, k_ref, sc_ref, o_ref, qbuf, qsem):
    c = pl.program_id(2)
    b = pl.program_id(0)
    h = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[b, h], qbuf, qsem)
        cp.start()
        cp.wait()

    k = k_ref[0, 0]
    raw = jax.lax.dot_general(qbuf[...], k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sc = sc_ref[0, 0]
    s8 = jnp.concatenate([sc[f:f + 1] for f in (0, 1) for _ in range(4)],
                         axis=0)
    o_ref[0, 0] = raw * s8


@functools.partial(jax.jit, static_argnames=("rows",))
def probe5(q, k, sc, rows=16384):
    b, hkv, s2, lane = k.shape
    q2 = jnp.zeros((b, hkv, GF, 128), jnp.bfloat16) + q.ravel()[0].astype(jnp.bfloat16)
    out = pl.pallas_call(
        _kernel_v5,
        grid=(b, hkv, s2 // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, rows, lane), lambda b, h, c: (b, h, c, 0)),
            pl.BlockSpec((1, 1, 2, rows), lambda b, h, c: (b, h, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, 1, GF, rows), lambda b, h, c: (b, h, 0, c)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, GF, s2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GF, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(q2, k, sc)
    return out


scan_time("v5 q2 via scratch DMA rows16384",
          lambda q, k, sc: probe5(q, k, sc, rows=16384),
          qs, kq, scf, bytes_=kq.size)


def _kernel_v6(q_ref, k_ref, sc_ref, o_ref):
    b = pl.program_id(0)
    h = pl.program_id(1)
    k = k_ref[0, 0]
    q2 = q_ref[b, h]
    raw = jax.lax.dot_general(q2, k.astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sc = sc_ref[0, 0]
    s8 = jnp.concatenate([sc[f:f + 1] for f in (0, 1) for _ in range(4)],
                         axis=0)
    o_ref[0, 0] = raw * s8


@functools.partial(jax.jit, static_argnames=("rows",))
def probe6(q, k, sc, rows=16384):
    b, hkv, s2, lane = k.shape
    q2 = jnp.zeros((b, hkv, GF, 128), jnp.bfloat16) + q.ravel()[0].astype(jnp.bfloat16)
    out = pl.pallas_call(
        _kernel_v6,
        grid=(b, hkv, s2 // rows),
        in_specs=[
            pl.BlockSpec((b, hkv, GF, 128), lambda b, h, c: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, rows, lane), lambda b, h, c: (b, h, c, 0)),
            pl.BlockSpec((1, 1, 2, rows), lambda b, h, c: (b, h, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, 1, GF, rows), lambda b, h, c: (b, h, 0, c)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, GF, s2), jnp.float32),
    )(q2, k, sc)
    return out


scan_time("v6 q2 whole-array block rows16384",
          lambda q, k, sc: probe6(q, k, sc, rows=16384),
          qs, kq, scf, bytes_=kq.size)
