"""Pallas TPU kernels for the hot decode ops.

TPU-native replacements for the reference's native kernel layer
(`library/sparse_attention/sparse_attention.cc`, `library/lsh/lsh.cc`):
  * `decode.flash_decode` — streaming dense decode attention with LSE export
    (the reference's FlashInfer decode + CPU `full_attention`,
    `sparse_attention.cc:988-1037`)
  * `mask.collision_words_pallas` — fused bit-plane >=2-of-L collision scan
    (the reference's `lsh.cc:210-288` retrieval)
  * `gather.gather_segments` — DMA segment gather of sampled KV rows (the
    reference's CPU gather-QK/WV kernels read DRAM by row;
    `sparse_attention.cc:38-103`)

All kernels run in interpreter mode on CPU for unit tests.
"""

from magicpig_tpu.ops.pallas.decode import flash_decode  # noqa: F401
