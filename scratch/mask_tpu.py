import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from magicpig_tpu.ops.bitcodes import collision_words, hash_bits, valid_words, build_planes
from magicpig_tpu.ops.pallas.mask import collision_words_pallas
from magicpig_tpu.ops.pallas.lsh_decode import lsh_fused_decode
from magicpig_tpu.ops.hashing import make_hash_projections

print(jax.devices())
rng = np.random.default_rng(0)
# correctness small
B, HKV, G, S, D, K, L = 1, 4, 4, 4096, 64, 10, 150
HQ = HKV * G
kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
proj = make_hash_projections(jax.random.key(1), D, K, L)
planes = jax.vmap(lambda kb: build_planes(kb.transpose(1, 0, 2), proj, K))(kc)
q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
qb = hash_bits(q, proj, K)
want = np.asarray(collision_words(qb, planes))
got = np.asarray(collision_words_pallas(qb, planes, K, L))
assert (want == got).all(), np.abs(want - got).max()
print("mask kernel bit-exact on TPU")

# perf 96K
NSTEP = 128
S = 96 * 1024
B, HKV, G = 1, 8, 4
HQ = HKV * G
W = S // 32
planes = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (B, HKV, L, K, W)), jnp.int32)
kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
knorm = jnp.asarray(np.abs(rng.standard_normal((B, HKV, S))) * 8 + 1, jnp.float32)
ln = jnp.asarray([S], jnp.int32)
qs = jnp.asarray(rng.standard_normal((NSTEP, B, HQ, D)), jnp.bfloat16)

def scan_time(name, step_fn, qs_stack, *ops, bytes_=None, n=NSTEP):
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

def mask_step(q, planes):
    qb = hash_bits(q, proj, K)
    return collision_words_pallas(qb, planes, K, L)
scan_time("pallas mask words 96K", mask_step, qs, planes,
          bytes_=planes.size * 4)

def fused_step(q, kc, vc, knorm, planes):
    qb = hash_bits(q, proj, K)
    return lsh_fused_decode(q, kc, vc, knorm, planes, qb, ln, K, L)
scan_time("lsh_fused_decode 96K d64 (pallas mask)", fused_step, qs,
          kc, vc, knorm, planes,
          bytes_=planes.size * 4 + 2 * kc.size * 2 + knorm.size * 4)
