"""magicpig_tpu — a TPU-native LSH-sampled LLM decoding engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of MagicPIG
(LSH importance-sampled attention for long-context decoding), redesigned for
TPU hardware:

* The KV cache, SimHash codes, and LSH bucket tables live in HBM (the
  reference offloads them to CPU DRAM to escape VRAM limits; on TPU the win
  is bandwidth reduction: a decode step touches ~2% of the cache).
* Hash-table construction runs as XLA sort/bucketize overlapped with chunked
  prefill; decode fuses query hashing, >=2-table collision retrieval, bucket
  gather, and the importance-sampling attention estimator.
* Sink/local tokens are always attended densely; partials merge by
  log-sum-exp.
* Scaling is mesh-based (pjit/shard_map): heads (and their hash tables)
  shard over a `model` axis, batch over `data`, with XLA collectives over
  ICI/DCN.
"""

__version__ = "0.1.0"

from magicpig_tpu.config import ModelConfig, LSHConfig  # noqa: F401
