from magicpig_tpu.runtime.engine import LLM  # noqa: F401
