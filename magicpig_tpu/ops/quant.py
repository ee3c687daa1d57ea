"""Per-row symmetric int8 quantization for the offload KV cache.

The reference stores the offloaded KV in bf16 CPU DRAM
(`models/attnserver.py:136-175`); on TPU, int8 storage halves both the HBM
footprint of the sparse layers' state (more requests per chip) and the bytes
streamed when scoring keys — the levers that set max-batch decode throughput.
Scales are per (head, token) row, f32.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, bits: int = 8):
    """[..., S, d] -> (int8 [..., S, d], scale f32 [..., S]).

    Symmetric per-row: scale = max|row| / (2**(bits-1) - 1); zero rows get
    scale 0 and dequantize to exact zeros. `bits < 8` quantizes to the
    coarser grid but keeps int8 storage — the values lie in
    [-(2**(bits-1)-1), 2**(bits-1)-1], so every int8 consumer (kernels
    included) works unchanged; packed sub-byte storage is a separate
    layout decision.
    """
    assert 2 <= bits <= 8, bits
    qmax = float(2 ** (bits - 1) - 1)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / qmax
    q = jnp.round(xf / jnp.maximum(scale, 1e-20)[..., None])
    q = jnp.clip(q, -qmax, qmax)
    return q.astype(jnp.int8), scale


def dequantize_rows(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of quantize_rows: int8 [..., S, d] * scale [..., S]."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def pack_nibbles(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Pack two int8 arrays holding 4-bit-grid values ([-7, 7]) into one
    int8 byte array: `lo` in the low nibble, `hi` in the high nibble.
    Inverse: `unpack_nibbles`."""
    return ((lo & jnp.int8(0x0F)) | (hi << 4)).astype(jnp.int8)


def unpack_nibbles(packed: jnp.ndarray):
    """(lo, hi) int8 from `pack_nibbles` bytes — arithmetic shifts restore
    the signs ((x << 4) >> 4 sign-extends the low nibble)."""
    lo = ((packed << 4) >> 4).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return lo, hi
