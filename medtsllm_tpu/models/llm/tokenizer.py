"""Tokenizer resolution.

The reference uses AutoTokenizer with pad=eos fallback
(models/medtsllm.py:206-217). Resolution order here:
  1. HF tokenizer from a local snapshot (no network),
  2. a deterministic byte-level tokenizer (ids = bytes + specials), so the
     prompt pipeline is fully hermetic without downloads.
"""

from __future__ import annotations


class ByteTokenizer:
    """Byte-level fallback: ids 0..255 are raw bytes; specials follow."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size
        self.bos_token_id = 256
        self.eos_token_id = 257
        self.pad_token_id = 258
        self.bos_token = "<s>"
        self.eos_token = "</s>"
        self.pad_token = "<pad>"

    def encode(self, text: str) -> list[int]:
        out = []
        specials = {self.bos_token: self.bos_token_id,
                    self.eos_token: self.eos_token_id,
                    self.pad_token: self.pad_token_id}
        i = 0
        while i < len(text):
            matched = False
            for tok, tid in specials.items():
                if text.startswith(tok, i):
                    out.append(tid)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
                out.extend(text[i].encode("utf-8"))
                i += 1
        return [min(t, self.vocab_size - 1) for t in out]

    def __call__(self, text, **kw):
        class _Enc:
            pass
        enc = _Enc()
        enc.input_ids = self.encode(text)
        return enc

    def decode(self, ids) -> str:
        return bytes(i for i in ids if i < 256).decode("utf-8", errors="replace")


def get_tokenizer(llm_id: str, cache_dir: str | None = None,
                  vocab_size: int = 512):
    """Returns an object with `.encode(str) -> list[int]` plus
    bos/eos/pad token-id attributes."""
    try:
        from transformers import AutoTokenizer
        from .loader import find_snapshot
        snap = find_snapshot(llm_id, cache_dir)
        src = str(snap) if snap is not None else llm_id
        tok = AutoTokenizer.from_pretrained(src, local_files_only=True)
        if tok.pad_token is None:
            if tok.eos_token:
                tok.pad_token = tok.eos_token
            else:
                tok.add_special_tokens({"pad_token": "[PAD]"})
        return tok
    except Exception:
        return ByteTokenizer(vocab_size=vocab_size)
