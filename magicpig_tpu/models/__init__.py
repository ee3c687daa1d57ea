from magicpig_tpu.models.llama import LlamaParams, init_params  # noqa: F401
