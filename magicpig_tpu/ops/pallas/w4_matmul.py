"""Packed-nibble W4 matmul: decode-path linears read int4 weights directly.

The XLA `_linear4` decode branch unpacks the whole [kin, out] int8 weight
as a materialized transient per step (read packed + write int8 + re-read
int8 = 5x the packed HBM bytes), which is why W4 measured as the
capacity-but-not-throughput format (dense-W4 77.9 vs dense-W8 175.4 tok/s
at 96K, BENCHMARKS.md round-3). This kernel streams the PACKED bytes
HBM->VMEM once and unpacks in-register: nibbles -> bf16 -> MXU dot with
f32 accumulation — the unpacked weight never exists outside registers.
It is the TPU-native analogue of the reference's weight-format conversion
engine living off the hot path (FBGEMM bf16 convert,
`/root/reference/library/sparse_attention/setup.py:39-45`).

Layout contract (must match `models/llama.py::_pack_nibbles`):
  * weights are packed HALF-SPLIT WITHIN EACH 128-INPUT GROUP: group g's
    packed rows are q[g*64 + j] = input (g*128 + j) in the low nibble and
    input (g*128 + 64 + j) in the high nibble. Unpack is then two static
    row-slices + one sublane concat — no lane interleave — and any shard
    boundary at group granularity (the TP row-parallel case,
    `parallel/mesh.py`) keeps every group self-contained.
  * scales are per (128-input group, output channel): [g, out] f32.

The dot runs bf16 x bf16 -> f32: nibble values in [-7, 7] are exact in
bf16 and the activation keeps full bf16 precision (no activation
quantization needed — unlike the int8-dot XLA path, which quantizes x to
make the MXU operands int8). Grid is (out blocks, kin blocks) with the
kin dimension innermost so the [M, out_blk] f32 accumulator block stays
resident across its revisits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, *, gpb: int, unpack8: bool):
    i_k = pl.program_id(1)
    ob = o_ref.shape[1]
    m = o_ref.shape[0]
    acc = jnp.zeros((m, ob), jnp.float32)
    for j in range(gpb):
        if unpack8:
            # int8-native unpack (would quarter VPU unpack instructions)
            # — NOT LOWERABLE on this target: Mosaic has no arith.shli
            # for vector<..xi8> ("failed to legalize", probe_r5/
            # profile_8b.log), which is why the int32 widen is the
            # default. Kept for interpret-mode A/B and future toolchains.
            wj8 = w_ref[j * 64:(j + 1) * 64, :]
            lo = ((wj8 << 4) >> 4).astype(jnp.bfloat16)   # inputs +[0, 64)
            hi = (wj8 >> 4).astype(jnp.bfloat16)          # inputs +[64, 128)
        else:
            wj = w_ref[j * 64:(j + 1) * 64, :].astype(jnp.int32)
            lo = ((wj << 28) >> 28).astype(jnp.bfloat16)
            hi = (wj >> 4).astype(jnp.bfloat16)
        wg = jnp.concatenate([lo, hi], axis=0)            # [128, ob]
        xg = x_ref[:, j * 128:(j + 1) * 128]              # [m, 128] bf16
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [m, ob]
        acc = acc + part * s_ref[j, :][None, :]

    @pl.when(i_k == 0)
    def _():
        o_ref[...] = acc

    @pl.when(i_k > 0)
    def _():
        o_ref[...] += acc


def _pick_div(n: int, cands) -> int | None:
    for c in cands:
        if n % c == 0:
            return c
    return None


def w4_block_shapes(m: int, kin: int, out: int):
    """(m_pad, rows_blk, out_blk) if the kernel supports the shape, else
    None. Constraints: 128-aligned kin/out; packed-row blocks of whole
    scale groups whose count is 8-aligned (Mosaic sublane tiling for the
    f32 scale block) or the whole weight; m small (decode-scale)."""
    if m > 64 or kin % 128 or out % 128:
        return None
    kp = kin // 2
    if kp <= 1024:
        rows_blk = kp          # single kin step; scale block == whole array
    else:
        rows_blk = _pick_div(kp, (1024, 512))
        if rows_blk is None:
            return None
    out_blk = _pick_div(out, (1024, 512, 256, 128))
    m_pad = (m + 7) // 8 * 8
    return m_pad, rows_blk, out_blk


@functools.partial(jax.jit, static_argnames=("interpret", "unpack8"))
def w4_matmul(x: jax.Array, q: jax.Array, scale: jax.Array,
              interpret: bool = False, unpack8: bool = False) -> jax.Array:
    """x [M, kin] (any float dtype) @ group-int4 W -> f32 [M, out].

    q: packed int8 [kin//2, out] (layout contract above);
    scale: f32 [kin//128, out].
    """
    m, kin = x.shape
    out = q.shape[-1]
    shapes = w4_block_shapes(m, kin, out)
    assert shapes is not None, (m, kin, out)
    m_pad, rows_blk, out_blk = shapes
    gpb = rows_blk // 64
    n_kin = (kin // 2) // rows_blk
    n_out = out // out_blk

    xp = jnp.zeros((m_pad, kin), jnp.bfloat16).at[:m].set(
        x.astype(jnp.bfloat16))
    res = pl.pallas_call(
        functools.partial(_kernel, gpb=gpb, unpack8=unpack8),
        grid=(n_out, n_kin),
        in_specs=[
            pl.BlockSpec((m_pad, gpb * 128), lambda o, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, out_blk), lambda o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, out_blk), lambda o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, out_blk), lambda o, k: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, q, scale.astype(jnp.float32))
    return res[:m]
