"""Bit-plane packed SimHash signatures and the >=2-of-L collision scan.

The reference stores one int16 bucket code per (key, table)
(`models/attnserver.py:162-167`) and the TP-masked variant counts code
equality per table (`evaluations/RULER/pred/attnserver_dist.py:822`). On TPU
the same math is cheaper as **bit-planes**: keep each of the K sign bits of
every table as a packed 32-key int32 word. For a decode query:

    match_word(l) = AND_k ( planes[l,k] XOR (q_bit[l,k] - 1) )

(`q_bit - 1` is 0 for a 1-bit and 0xFFFFFFFF for a 0-bit, so the XOR yields
"key bit == query bit" per lane), and the >=2-of-L rule is two bitwise
accumulators over tables:

    twice |= once & match;  once |= match

Equivalent to the reference's 0->1->2 mask walk (`library/lsh/lsh.cc:272-283`)
but 32 keys per op and K*L bits (188 B) instead of 16*L bits (300 B) per key
of HBM traffic.

Layout: planes [..., L, K, W] int32, W = S/32, token t lives in word t//32
bit t%32 (t is the position inside the offload region).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WORD = 32


def num_words(seq_len: int) -> int:
    assert seq_len % WORD == 0, "offload capacity must be 32-aligned"
    return seq_len // WORD


def pack_bitplanes(bits: jax.Array) -> jax.Array:
    """Pack sign bits into key-minor int32 planes.

    bits: [..., S, L, K] (bool or 0/1 int), S % 32 == 0.
    Returns [..., L, K, S//32] int32: word w bit j = bits[..., w*32+j, l, k].
    """
    *lead, s, L, K = bits.shape
    w = num_words(s)
    b = bits.astype(jnp.int32).reshape(*lead, w, WORD, L, K)
    shifts = jnp.arange(WORD, dtype=jnp.int32)
    shape = (1,) * len(lead) + (1, WORD, 1, 1)
    words = jnp.sum(b << shifts.reshape(shape), axis=-3)  # [..., w, L, K]
    return jnp.moveaxis(words, -3, -1)                    # [..., L, K, w]


def hash_bits(x: jax.Array, projections: jax.Array, K: int) -> jax.Array:
    """Sign bits of the SimHash projection: [..., D] -> [..., L, K] int32.

    Same projection bank as `ops.hashing.hash_codes`
    (reference `models/attnserver.py:55,159-168`); sign is scale-invariant so
    inputs need not be normalized.
    """
    proj = jnp.einsum("...d,dh->...h", x.astype(jnp.float32),
                      projections.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    bits = (proj > 0).astype(jnp.int32)
    return bits.reshape(*bits.shape[:-1], -1, K)


def collision_words(q_bits: jax.Array, planes: jax.Array) -> jax.Array:
    """>=2-of-L collision mask, packed: 32 keys per int32 word.

    q_bits: [B, Hq, L, K] 0/1; planes: [B, Hkv, L, K, W] int32.
    Returns [B, Hq, W] int32 — bit j of word w set iff key w*32+j collides
    with the query in >= 2 tables.
    """
    b, hq, L, K = q_bits.shape
    hkv, W = planes.shape[1], planes.shape[-1]
    g = hq // hkv
    qsel = (q_bits - 1).reshape(b, hkv, g, L, K)          # 0 or -1 per bit

    # Slice per table INSIDE the loop: XLA then streams `planes` once with a
    # small [B,Hkv,G,K,W] transient, instead of materializing the
    # [B,Hkv,G,L,K,W] broadcast (measured 5x slower at L=150, W=3072).
    def body(l, carry):
        once, twice = carry
        pl_l = jax.lax.dynamic_index_in_dim(planes, l, 2, keepdims=False)
        qs_l = jax.lax.dynamic_index_in_dim(qsel, l, 3, keepdims=False)
        m = pl_l[:, :, None] ^ qs_l[..., None]            # [B,Hkv,G,K,W]
        m = jax.lax.reduce(m, jnp.int32(-1), jax.lax.bitwise_and, (3,))
        return (once | m, twice | (once & m))

    once = jnp.zeros((b, hkv, g, W), jnp.int32)
    twice = jnp.zeros((b, hkv, g, W), jnp.int32)
    once, twice = jax.lax.fori_loop(0, L, body, (once, twice))
    return twice.reshape(b, hq, W)


def unpack_words(words: jax.Array, seq_len: int) -> jax.Array:
    """[..., W] int32 -> bool [..., W*32] (trailing bits beyond seq_len kept;
    caller masks by length)."""
    shifts = jnp.arange(WORD, dtype=jnp.int32)
    bits = (words[..., None] >> shifts) & 1
    return bits.reshape(*words.shape[:-1], -1).astype(bool)[..., :seq_len]


def valid_words(lengths: jax.Array, w: int) -> jax.Array:
    """Packed validity mask for per-request lengths: [B] -> [B, W] int32 with
    the first `length` bits set."""
    word_idx = jnp.arange(w, dtype=jnp.int32)[None]        # [1, W]
    base = word_idx * WORD
    full = (base + WORD <= lengths[:, None]).astype(jnp.int32) * jnp.int32(-1)
    partial_bits = jnp.clip(lengths[:, None] - base, 0, WORD)
    # (1 << partial) - 1 without overflow at partial == 32: full mask wins.
    partial = jnp.where(partial_bits >= WORD, jnp.int32(-1),
                        (jnp.int32(1) << partial_bits) - 1)
    return jnp.where(base + WORD <= lengths[:, None], full, partial)


# ---------------------------------------------------------------------------
# Block-striped fold-major plane layout (the fused scan+attend kernel's form)
# ---------------------------------------------------------------------------
#
# The flat layout above puts token t at word t//32 bit t%32. Extracting a
# per-token mask from that inside a Pallas kernel needs per-lane variable
# shifts and cross-lane gathers. The BLOCKED layout permutes tokens so the
# extraction is 32 static shift/ANDs per block:
#
#   * tokens are grouped into blocks of `blk` (the attend kernel's grid
#     step); words are block-major: word w_global = c*wb + w, wb = blk//32;
#   * within block c, tokens are ordered FOLD-MAJOR (the layout the folded
#     int8 cache streams give the kernel): token t = c*blk + r*fold + f has
#     local id m = f*rows + r (rows = blk//fold);
#   * bit j of word (c, w) = local id m = j*wb + w.
#
# So bit j of the per-block match words [G, wb] is a CONTIGUOUS run of wb
# fold-major token slots — `(words >> j) & 1` peels the mask off one
# lane-aligned chunk at a time, no gathers. The flat layout is the special
# case blk=32, fold=1. `collision_words` is layout-agnostic (words are
# words); only pack/unpack/valid change.


def plane_block(off_cap: int, fold: int, max_block: int = 49152) -> int:
    """Block size for the blocked plane layout: the largest divisor of
    `off_cap` that is <= max_block and a multiple of fold*32, preferring
    multiples of 4096 (wb = blk/32 lane-aligned to 128 — the shapes the
    fused kernel's lane-concat extraction wants). max_block=49152 is the
    measured optimum at the bench's B=2 96K point (1.524 ms/layer kernel
    = ~331 GB/s, at the mixed int32/int8 stream floor; 32768 ran 1.037 at
    B=1 / slower at B=2, 98304 best at B=1 only — blk sweep 2026-08-20).

    MAGICPIG_PLANE_BLOCK_MAX overrides max_block (block-size sweeps on
    hardware; the layout is deterministic in (off_cap, fold, max_block),
    so fill and decode in the SAME process always agree)."""
    import os
    max_block = int(os.environ.get("MAGICPIG_PLANE_BLOCK_MAX", max_block))
    best = 0
    for blk in range(min(off_cap, max_block), 0, -1):
        if off_cap % blk or blk % (fold * WORD):
            continue
        if blk % 4096 == 0:
            return blk
        best = best or blk
    return best


def pack_bitplanes_blocked(bits: jax.Array, blk: int, fold: int) -> jax.Array:
    """Pack sign bits into the blocked layout (see module comment).

    bits: [..., S, L, K] (bool/0-1), S % blk == 0. Returns
    [..., L, K, S//32] int32, words block-major."""
    *lead, s, L, K = bits.shape
    rows, wb = blk // fold, blk // WORD
    nb = s // blk
    b = bits.astype(jnp.int32).reshape(*lead, nb, rows, fold, L, K)
    b = jnp.swapaxes(b, -4, -3)                 # [..., nb, fold, rows, L, K]
    b = b.reshape(*lead, nb, WORD, wb, L, K)    # m = f*rows+r -> (j, w)
    shifts = jnp.arange(WORD, dtype=jnp.int32).reshape(
        (1,) * len(lead) + (1, WORD, 1, 1, 1))
    words = jnp.sum(b << shifts, axis=-4)       # [..., nb, wb, L, K]
    words = jnp.moveaxis(words, (-2, -1), (-4, -3))  # [..., L, K, nb, wb]
    return words.reshape(*lead, L, K, nb * wb)


def unpack_words_blocked(words: jax.Array, blk: int, fold: int,
                         seq_len: int) -> jax.Array:
    """Blocked [..., W] int32 -> token-order bool [..., seq_len]."""
    *lead, w_total = words.shape
    rows, wb = blk // fold, blk // WORD
    nb = w_total // wb
    shifts = jnp.arange(WORD, dtype=jnp.int32)
    bits = (words.reshape(*lead, nb, wb)[..., None] >> shifts) & 1
    bits = jnp.swapaxes(bits, -1, -2)           # [..., nb, 32(j), wb]
    bits = bits.reshape(*lead, nb, fold, rows)  # m-order -> (f, r)
    bits = jnp.swapaxes(bits, -1, -2)           # [..., nb, rows, fold]
    return bits.reshape(*lead, nb * blk).astype(bool)[..., :seq_len]


def valid_words_blocked(lengths: jax.Array, off_cap: int, blk: int,
                        fold: int) -> jax.Array:
    """Packed validity mask in the blocked layout: [B] -> [B, W] int32 with
    exactly the bits of tokens < length set."""
    rows, wb = blk // fold, blk // WORD
    w_total = off_cap // WORD
    w = jnp.arange(w_total, dtype=jnp.int32)
    c, wl = w // wb, w % wb
    j = jnp.arange(WORD, dtype=jnp.int32)
    m = j[None, :] * wb + wl[:, None]                       # [W, 32]
    t = c[:, None] * blk + (m % rows) * fold + (m // rows)  # token index
    valid = t[None] < lengths[:, None, None]                # [B, W, 32]
    return jnp.sum(valid.astype(jnp.int32) << j, axis=-1)


@functools.partial(jax.jit, static_argnames=("K", "blk", "fold"))
def build_planes_blocked(keys: jax.Array, projections: jax.Array, K: int,
                         blk: int, fold: int) -> jax.Array:
    """Hash + pack a whole key sequence into BLOCKED planes, chunked over
    fold*wb-token sub-chunks (each contributes whole words at a fixed
    j-stripe set, so partial sums accumulate without bit overlap).

    keys: [S, H, D] (centered); returns [H, L, K, S//32] int32."""
    s, h, d = keys.shape
    lk = projections.shape[-1]
    K = int(K)
    L = lk // K
    rows, wb = blk // fold, blk // WORD
    jpf = WORD // fold          # j-stripes per fold slot
    chunk = fold * wb           # tokens per sub-chunk (= blk / jpf)
    assert s % blk == 0 and blk % (fold * WORD) == 0
    n_chunks = s // chunk

    def one(acc, inp):
        kc, idx = inp                           # kc [chunk, H, D]
        c, i = idx // jpf, idx % jpf
        bits = hash_bits(kc, projections, K)    # [chunk, H, L, K]
        # chunk-local token r''*fold + f -> word (j = f*jpf + i, w = r'').
        b4 = bits.astype(jnp.int32).reshape(wb, fold, h, L, K)
        part = jnp.zeros((wb, h, L, K), jnp.int32)
        for f in range(fold):
            part = part + (b4[:, f] << (f * jpf + i))
        part = part.transpose(1, 2, 3, 0)       # [H, L, K, wb]
        old = jax.lax.dynamic_slice_in_dim(acc, c * wb, wb, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(
            acc, old + part, c * wb, axis=-1), None

    acc0 = jnp.zeros((h, L, K, s // WORD), jnp.int32)
    acc, _ = jax.lax.scan(
        one, acc0, (keys.reshape(n_chunks, chunk, h, d),
                    jnp.arange(n_chunks, dtype=jnp.int32)))
    return acc


@functools.partial(jax.jit, static_argnames=("K", "seq_len", "chunk"))
def build_planes(keys: jax.Array, projections: jax.Array, K: int,
                 *, seq_len: int | None = None, chunk: int = 8192):
    """Hash + pack a whole key sequence into planes, chunked over tokens so
    the [S, L*K] bit temp never materializes (prefill-time table build,
    reference `build_table` `models/attnserver.py:178-193`).

    keys: [S, H, D] (centered); returns [H, L, K, S//32] int32.
    """
    s, h, d = keys.shape
    if seq_len is None:
        seq_len = s
    lk = projections.shape[-1]
    K = int(K)
    L = lk // K
    chunk = min(chunk, s)
    if s % chunk:
        # s (the offload capacity) is always WORD-aligned but need not be
        # a multiple of the default chunk (e.g. 8448 at an 8K context):
        # take the largest WORD-multiple divisor <= chunk. WORD itself
        # always qualifies, so the search cannot come up empty.
        chunk = next(c for c in range(chunk - chunk % WORD, WORD - 1,
                                      -WORD) if s % c == 0)
    assert s % chunk == 0 and chunk % WORD == 0
    n_chunks = s // chunk

    def one(carry, kc):  # kc: [chunk, H, D]
        bits = hash_bits(kc, projections, K)               # [chunk, H, L, K]
        words = pack_bitplanes(bits.transpose(1, 0, 2, 3))  # [H, L, K, chunk/32]
        return carry, words

    _, planes = jax.lax.scan(one, None,
                             keys.reshape(n_chunks, chunk, h, d))
    # planes: [n_chunks, H, L, K, chunk/32] -> [H, L, K, W]
    planes = jnp.moveaxis(planes, 0, -2)
    return planes.reshape(h, L, K, num_words(s))
