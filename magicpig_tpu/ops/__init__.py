"""Core math ops: SimHash, collision debias, LSE merge, RoPE, norms, sampling."""

from magicpig_tpu.ops.hashing import (  # noqa: F401
    make_hash_projections,
    hash_codes,
    pack_bits,
)
from magicpig_tpu.ops.debias import collision_weight, debias_scores  # noqa: F401
from magicpig_tpu.ops.merge import merge_partials  # noqa: F401
from magicpig_tpu.ops.norms import rms_norm  # noqa: F401
from magicpig_tpu.ops.rope import rope_cos_sin, apply_rope  # noqa: F401
from magicpig_tpu.ops.sampling import top_p_sample  # noqa: F401
