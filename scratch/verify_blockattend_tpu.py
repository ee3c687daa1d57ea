"""Hardware compile+parity check for block_attend after the packed-mode
V-scale broadcast fix (Mosaic rejected the sublane broadcast from a
lane-offset slice; see block_attend.online_update).

Runs the packed (pk=2) quantized config — the exact shape class that
failed to lower on 2026-08-18 — plus the unpacked int8 config, and
compares against the XLA reference path in fp32. rescore_attend's
packed+quant lowering is exercised on hardware by
scratch/verify_pack4_tpu.py (server-level block_topk decode with the
default "rescore" pipeline), not here.
"""

import numpy as np
import jax
import jax.numpy as jnp

from magicpig_tpu.ops.pallas.block_attend import block_attend
from magicpig_tpu.ops.pack4 import SPAN_TOKENS


def ref_attend(scores_folded, blk_ids, v, v_scale, block_size, d, packed):
    b, hkv, gfp, sfp = scores_folded.shape
    pk = 2 if packed else 1
    fold = max(128 // d, 1)
    g = gfp // (pk * fold)
    s = sfp * fold * pk
    sf = s // fold
    if v.shape[2] == s and fold > 1:
        v = v.reshape(b, hkv, sf, fold * d)
    vf = v.astype(jnp.float32)
    if v_scale is not None:
        # [.., f, c] scales token c*fold+f = folded row c, lanes f*d:(f+1)*d
        scale = jnp.repeat(
            v_scale.astype(jnp.float32).transpose(0, 1, 3, 2), d, axis=-1)
        vf = vf * scale
    # token t = c*fold + f lives at folded row c, lanes f*d:(f+1)*d
    outs, lses = [], []
    rows = block_size // (pk * fold)
    vrows = block_size // fold
    for bi in range(b):
        for h in range(hkv):
            o_h, l_h = [], []
            for gi in range(g):
                svals, vvals = [], []
                for nb in np.asarray(blk_ids[bi, h]):
                    for i in range(pk * fold):
                        hlf, f = i // fold, i % fold
                        sl = scores_folded[bi, h, i * g + gi,
                                           nb * rows:(nb + 1) * rows]
                        vv = vf[bi, h, nb * vrows + hlf * rows:
                                nb * vrows + (hlf + 1) * rows,
                                f * d:(f + 1) * d]
                        svals.append(sl)
                        vvals.append(vv)
                sv = jnp.concatenate(svals)
                vv = jnp.concatenate(vvals, 0)
                m = jnp.max(sv)
                p = jnp.exp(sv - m)
                l = jnp.sum(p)
                o_h.append((p @ vv) / l)
                l_h.append(m + jnp.log(l))
            outs.append(jnp.stack(o_h))
            lses.append(jnp.stack(l_h))
    return (jnp.stack(outs).reshape(b, hkv * g, d),
            jnp.stack(lses).reshape(b, hkv * g))


def run(packed, quant, d=64, g=4):
    pk = 2 if packed else 1
    fold = max(128 // d, 1)
    block = SPAN_TOKENS if packed else 512
    nblk, nbp = 8, 4
    s = nblk * block
    sf = s // fold
    rng = np.random.default_rng(0)
    b, hkv = 1, 2
    scores = jnp.asarray(
        rng.normal(size=(b, hkv, g * fold * pk, s // (fold * pk))), jnp.float32)
    ids = jnp.asarray(rng.choice(nblk, size=(b, hkv, nbp), replace=False),
                      jnp.int32)
    if quant:
        v = jnp.asarray(rng.integers(-127, 127, size=(b, hkv, sf, fold * d)),
                        jnp.int8)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(b, hkv, fold, sf)),
                         jnp.float32)
    else:
        v = jnp.asarray(rng.normal(size=(b, hkv, sf, fold * d)), jnp.bfloat16)
        vs = None
    out, lse = block_attend(scores, ids, v, vs, block, d, packed=packed)
    out, lse = jax.block_until_ready((out, lse))
    ro, rl = ref_attend(scores, ids, v, vs, block, d, packed)
    eo = float(jnp.max(jnp.abs(out - ro)))
    el = float(jnp.max(jnp.abs(lse - rl)))
    print(f"packed={packed} quant={quant}: max|dout|={eo:.4g} "
          f"max|dlse|={el:.4g}")
    assert eo < 2e-2 and el < 1e-2, (eo, el)


if __name__ == "__main__":
    print(jax.devices())
    run(packed=True, quant=True)
    run(packed=False, quant=True)
    run(packed=False, quant=False)
    print("block_attend hardware parity OK")
