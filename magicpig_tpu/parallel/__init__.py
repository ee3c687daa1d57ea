from magicpig_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_pspecs,
    shard_engine,
    state_pspecs,
)
