from magicpig_tpu.utils.tokenizer import get_tokenizer  # noqa: F401
