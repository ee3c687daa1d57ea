"""Tokenizer loading with an offline byte-level fallback.

The reference requires `AutoTokenizer.from_pretrained` (network / cached
files). This environment may be offline, so examples fall back to a
byte-level tokenizer — good enough to exercise the engine end-to-end on raw
text, while any local HF tokenizer directory works when available.
"""

from __future__ import annotations


class ByteTokenizer:
    """Reversible byte-level tokenizer: token id = byte value + 3.

    Reserves 0=pad, 1=bos, 2=eos. Vocab 259 <= any model vocab.
    """

    bos_token_id = 1
    eos_token_id = 2

    def encode(self, text: str, add_bos: bool = True):
        ids = [b + 3 for b in text.encode("utf-8")]
        return ([self.bos_token_id] + ids) if add_bos else ids

    def decode(self, ids):
        data = bytes(i - 3 for i in ids if 3 <= i < 259)
        return data.decode("utf-8", errors="replace")


def get_tokenizer(name_or_path: str | None):
    """HF tokenizer when loadable, byte fallback otherwise."""
    if name_or_path:
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(name_or_path)
        except Exception:
            pass
    return ByteTokenizer()
