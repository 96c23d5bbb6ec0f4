"""Tokenizers: HF Qwen2 adapter + self-contained byte-level fallback.

The framework needs only a small tokenizer surface (the Protocol below).
`load_tokenizer(path)` returns the HF-backed adapter when a checkpoint
directory with tokenizer files is given (exact Qwen2 BPE parity for
deployments), and the dependency-free `ByteTokenizer` otherwise (tests,
CI, smoke runs — deterministic and reversible, including the action
glyphs which are multi-byte UTF-8).
"""
from __future__ import annotations

import os
from typing import List, Optional, Protocol, Sequence


class Tokenizer(Protocol):
    im_start_id: int
    im_end_id: int
    newline_id: int
    pad_id: int
    image_token_id: int
    memory_token_id: int

    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: Sequence[int]) -> str: ...
    @property
    def vocab_size(self) -> int: ...


class ByteTokenizer:
    """UTF-8 byte tokenizer with ChatML + multimodal specials.

    ids 0..255 = raw bytes; specials follow. Reversible for arbitrary text.
    `newline_id` is ord('\\n') = 10 (plays the role of Qwen's token 198 in
    the unmask set; reference: vln_action_dataset.py:247).
    """

    SPECIALS = ("<|im_start|>", "<|im_end|>", "<|endoftext|>",
                "<image>", "<memory>")

    def __init__(self):
        self._special_to_id = {s: 256 + i for i, s in enumerate(self.SPECIALS)}
        self._id_to_special = {v: k for k, v in self._special_to_id.items()}
        self.im_start_id = self._special_to_id["<|im_start|>"]
        self.im_end_id = self._special_to_id["<|im_end|>"]
        self.eos_id = self._special_to_id["<|endoftext|>"]
        self.pad_id = self.eos_id
        self.image_token_id = self._special_to_id["<image>"]
        self.memory_token_id = self._special_to_id["<memory>"]
        self.newline_id = ord("\n")

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.SPECIALS)

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        i = 0
        while i < len(text):
            matched = False
            for s, sid in self._special_to_id.items():
                if text.startswith(s, i):
                    ids.append(sid)
                    i += len(s)
                    matched = True
                    break
            if not matched:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        out: List[str] = []
        buf = bytearray()
        for t in ids:
            t = int(t)
            if t < 0:
                t = {-200: self.image_token_id,
                     -300: self.memory_token_id}.get(t, None)
                if t is None:
                    continue
            if t >= 256:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                out.append(self._id_to_special.get(t, ""))
            else:
                buf.append(t)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)


class HFTokenizerAdapter:
    """Wraps a HF Qwen2 tokenizer directory for exact BPE parity.

    Mirrors the reference's runtime special-token registration
    (reference: streamvln_eval.py:401-407): <image>/<memory> are added as
    specials, im_start/im_end come from additional_special_tokens, and
    token 198 ('\\n') joins the unmask set.
    """

    def __init__(self, path: str, model_max_length: int = 4096):
        import transformers
        self._tok = transformers.AutoTokenizer.from_pretrained(
            path, model_max_length=model_max_length, padding_side="right")
        self._tok.add_tokens(["<image>"], special_tokens=True)
        self._tok.add_tokens(["<memory>"], special_tokens=True)
        self.image_token_id = self._tok.convert_tokens_to_ids("<image>")
        self.memory_token_id = self._tok.convert_tokens_to_ids("<memory>")
        self.im_start_id = self._tok.convert_tokens_to_ids("<|im_start|>")
        self.im_end_id = self._tok.convert_tokens_to_ids("<|im_end|>")
        if None in (self.im_start_id, self.im_end_id):
            # older checkpoints: first two additional specials are
            # im_start/im_end (reference: vln_action_dataset.py:244)
            self.im_start_id, self.im_end_id = \
                self._tok.additional_special_tokens_ids[:2]
        # the standalone-newline token joins the unmask set; 198 on the
        # real Qwen2 vocab (reference: vln_action_dataset.py:246) —
        # derived from the vocab here so any BPE works
        nl = self._tok("\n", add_special_tokens=False)["input_ids"]
        assert len(nl) == 1, f"newline is not a single token: {nl}"
        self.newline_id = nl[0]
        # im_end_id may have been recovered from additional specials
        # above; keep eos consistent with it rather than re-deriving
        # (a literal "<|im_end|>" lookup returns None on those vocabs)
        self.eos_id = self.im_end_id
        self.pad_id = (self._tok.pad_token_id
                       if self._tok.pad_token_id is not None
                       else self._tok.convert_tokens_to_ids("<|endoftext|>"))

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def encode(self, text: str) -> List[int]:
        return self._tok(text, add_special_tokens=False)["input_ids"]

    def decode(self, ids: Sequence[int]) -> str:
        clean = [int(t) for t in ids if int(t) >= 0]
        return self._tok.decode(clean, skip_special_tokens=False)


def load_tokenizer(path: Optional[str] = None,
                   model_max_length: int = 4096) -> Tokenizer:
    if path and os.path.isdir(path) and (
            os.path.exists(os.path.join(path, "tokenizer.json"))
            or os.path.exists(os.path.join(path, "tokenizer_config.json"))):
        return HFTokenizerAdapter(path, model_max_length)
    return ByteTokenizer()
