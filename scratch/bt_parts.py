import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from magicpig_tpu.ops.pallas.score import exact_scores_folded
from magicpig_tpu.ops.pallas.block_attend import block_attend
from magicpig_tpu.ops.quant import quantize_rows

print(jax.devices())
rng = np.random.default_rng(0)
NSTEP = 128
B, HKV, G, D = 4, 8, 4, 64
S = 96 * 1024
BS = 512
NB = S // BS
NBP = 16

kq = jnp.asarray(rng.integers(-127, 127, (B, HKV, S // 2, 128)), jnp.int8)
ks = jnp.asarray(np.abs(rng.standard_normal((B, HKV, 2, S // 2))) * 0.05,
                 jnp.float32)   # fold-major [B,Hkv,fold,S/fold]
vq = jnp.asarray(rng.integers(-127, 127, (B, HKV, S // 2, 128)), jnp.int8)
vs = jnp.asarray(np.abs(rng.standard_normal((B, HKV, 2, S // 2))) * 0.05,
                 jnp.float32)
qs = jnp.asarray(rng.standard_normal((NSTEP, B, HKV * G, D)), jnp.bfloat16)
ln = jnp.full((B,), S, jnp.int32)

def scan_time(name, step_fn, qs_stack, *ops, n=NSTEP, bytes_=None):
    @jax.jit
    def run(qs, *ops):
        def body(carry, q):
            out = step_fn(q, *ops)
            return carry, jax.tree.leaves(out)[0].ravel()[0]
        _, outs = jax.lax.scan(body, 0, qs)
        return outs.sum()
    np.asarray(run(qs_stack, *ops))
    q2 = qs_stack + jnp.asarray(1e-3, qs_stack.dtype)
    t0 = time.perf_counter()
    np.asarray(run(q2, *ops))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
    print(f"{name:44s} {dt*1e3:8.3f} ms{extra}", flush=True)

for BT in (16384, 32768):
    def score_step(q, kq, ks, BT=BT):
        return exact_scores_folded(q, kq, ks, block_tokens=BT)
    scan_time(f"scorer int8 B{B} 96K bt{BT}", score_step, qs, kq, ks,
              bytes_=kq.size)

FOLD = 128 // D
scores = jnp.asarray(rng.standard_normal(
    (B, HKV, FOLD * G, S // FOLD)), jnp.float32)

def rank_step(q, scores):
    blk_sc = scores.reshape(B, HKV, FOLD * G, NB, BS // FOLD).max(
        axis=(2, 4)) + q.ravel()[0] * 0
    return jax.lax.top_k(blk_sc, NBP)[1]
scan_time(f"rank+topk B{B}", rank_step, qs, scores)

ids = jnp.asarray(rng.integers(0, NB, (B, HKV, NBP)), jnp.int32)

def attend_step(q, scores, vq, vs, ids):
    s2 = scores + q.ravel()[0] * 0  # tie to q to vary per step
    return block_attend(s2, ids, vq, vs, BS, D)
scan_time(f"block_attend B{B} {NBP} blocks", attend_step, qs, scores, vq, vs, ids)


def rank_step2(q, scores):
    blk_sc = scores.reshape(B, HKV, FOLD * G, NB, BS // FOLD).max(
        axis=(2, 4)) + q.ravel()[0] * 0
    return jax.lax.approx_max_k(blk_sc, NBP)[1]
scan_time(f"rank+approx_max_k B{B}", rank_step2, qs, scores)
