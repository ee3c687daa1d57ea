"""TPU drive for the packed-int4 offload K path (/verify).

Runs the server-level fill+decode block_topk path at d=64 on the REAL chip
(compiled Mosaic kernels — interpret-mode parity is already covered by
tests/test_pack4.py) and checks:
  * packed Pallas (use_pallas="on") vs packed XLA unpack fallback ("off")
  * packed vs unpacked-int4 small-block config at FULL block budget
    (every path attends to all offload tokens, so the layout must cancel)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices())

from magicpig_tpu.config import LSHConfig, ModelConfig
from magicpig_tpu.ops.pack4 import SPAN_TOKENS
from magicpig_tpu.runtime.server import decode_sparse_layer, fill_sparse_layer
from magicpig_tpu.runtime.state import init_state

rng = np.random.default_rng(4)
d, hkv, g, b = 64, 2, 2, 2
max_len = 4 + 16 + 1024 + 4
p_pad = 1044
true_lens = [jnp.asarray(1040), jnp.asarray(700)]
k_full = jnp.asarray(rng.standard_normal((b, p_pad, hkv, d)), jnp.float32)
v_full = jnp.asarray(rng.standard_normal((b, p_pad, hkv, d)), jnp.float32)
q = jnp.asarray(rng.standard_normal((b, hkv * g, d)), jnp.float32)
k_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
v_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)

cfg = ModelConfig(name="t", vocab_size=64, hidden_size=d * 2,
                  intermediate_size=64, num_hidden_layers=1,
                  num_attention_heads=4, num_key_value_heads=hkv,
                  head_dim=d, dtype=jnp.float32)
base = LSHConfig(K=10, L=0, estimator="block_topk", offload_quant="int4",
                 num_sink_tokens=4, num_local_tokens=16,
                 generation_buffer=32, block_topk_budget_frac=1.0,
                 dense_layers=())


def run(lsh):
    state = init_state(cfg, lsh, b, max_len)
    proj = jnp.zeros((1,), jnp.float32)
    for r in range(b):
        state = fill_sparse_layer(state, 0, jnp.asarray(r), k_full[r],
                                  v_full[r], true_lens[r], proj, lsh)
    out, _, frac = decode_sparse_layer(state, 0, q, k_new, v_new, proj, lsh)
    return np.asarray(out)


packed = dataclasses.replace(base, block_topk_block_size=SPAN_TOKENS)
assert packed.packed_k4(d)
o_pallas = run(dataclasses.replace(packed, use_pallas="on"))
o_fb = run(dataclasses.replace(packed, use_pallas="off"))
o_ref = run(dataclasses.replace(base, block_topk_block_size=128,
                                use_pallas="off"))
e1 = np.abs(o_pallas - o_fb).max()
e2 = np.abs(o_pallas - o_ref).max()
print(f"packed Mosaic vs XLA fallback: max err {e1:.5f}")
print(f"packed Mosaic vs unpacked-int4: max err {e2:.5f}")
assert e1 < 5e-3 and e2 < 5e-3, (e1, e2)

# Partial-budget sanity: ranked selection on the packed layout behaves
# (top 25% of blocks; non-degenerate output, finite where length>0).
part = dataclasses.replace(packed, block_topk_budget_frac=0.25,
                           use_pallas="on")
o_part = run(part)
assert np.isfinite(o_part).all()
print("packed partial-budget decode finite:", o_part.shape)

# int8 dense KV (dense_quant): compiled flash_decode in-register dequant
# vs the dequantize-then-attend oracle on the real chip.
from magicpig_tpu.ops.attention import full_decode
from magicpig_tpu.ops.pallas.decode import flash_decode
from magicpig_tpu.ops.quant import dequantize_rows, quantize_rows

B, HKV, G, S, D = 2, 2, 4, 2048, 64
fold = 128 // D
qd = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.float32)
kd = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
vd = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
kq, ks = quantize_rows(kd)
vq, vs = quantize_rows(vd)
length = jnp.asarray([S - 100, 700], jnp.int32)
want, _ = full_decode(qd, dequantize_rows(kq, ks, jnp.float32),
                      dequantize_rows(vq, vs, jnp.float32), length)


def fold_sc(sc):
    return sc.reshape(B, HKV, S // fold, fold).transpose(0, 1, 3, 2)


got, _ = flash_decode(qd, kq.reshape(B, HKV, S // fold, 128),
                      vq.reshape(B, HKV, S // fold, 128), length,
                      k_scale=fold_sc(ks), v_scale=fold_sc(vs))
e3 = np.abs(np.asarray(got) - np.asarray(want)).max()
print(f"flash_decode int8 Mosaic vs oracle: max err {e3:.5f}")
assert e3 < 1e-2, e3
print("VERIFY OK")
