"""Conversation templates (reference surface: llava/conversation.py —
Conversation dataclass + SeparatorStyle registry, ~20 templates; the one
StreamVLN exercises is `qwen_1_5` ChatML, :443-452, 566-596).

String-level rendering for serving/eval interop; the tokenizer-level
ChatML path lives in data/chatml.py.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    TWO = "TWO"            # vicuna: ' ' / '</s>'
    PLAIN = "PLAIN"        # bare, sep-joined
    CHATML = "CHATML"      # <|im_start|>role\n...<|im_end|>
    LLAMA_2 = "LLAMA_2"    # [INST] ... [/INST]
    MPT = "MPT"            # <|im_start|>role\n...<|im_end|> no trail \n


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    sep_style: SeparatorStyle
    sep: str = "\n"
    sep2: Optional[str] = None
    version: str = "unknown"

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        msgs = self.messages
        if self.sep_style == SeparatorStyle.CHATML:
            out = ""
            if self.system:
                out += f"<|im_start|>system\n{self.system}<|im_end|>\n"
            for role, msg in msgs:
                if msg is None:
                    out += f"<|im_start|>{role}\n"
                else:
                    out += (f"<|im_start|>{role}\n{msg}<|im_end|>\n")
            return out
        if self.sep_style == SeparatorStyle.MPT:
            out = f"<|im_start|>system\n{self.system}<|im_end|>" \
                if self.system else ""
            for role, msg in msgs:
                out += f"<|im_start|>{role}\n"
                if msg is not None:
                    out += f"{msg}<|im_end|>"
            return out
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2 or self.sep]
            out = self.system + seps[0] if self.system else ""
            for i, (role, msg) in enumerate(msgs):
                if msg is None:
                    out += f"{role}:"
                else:
                    out += f"{role}: {msg}{seps[i % 2]}"
            return out
        if self.sep_style == SeparatorStyle.LLAMA_2:
            out = ""
            sys_txt = f"<<SYS>>\n{self.system}\n<</SYS>>\n\n" \
                if self.system else ""
            for i, (role, msg) in enumerate(msgs):
                if i % 2 == 0:
                    body = (sys_txt if i == 0 else "") + (msg or "")
                    out += f"<s>[INST] {body} [/INST]"
                elif msg is not None:
                    out += f" {msg} </s>"
            return out
        if self.sep_style == SeparatorStyle.PLAIN:
            return self.sep.join(m for _, m in msgs if m is not None) \
                + self.sep
        raise ValueError(self.sep_style)

    def copy(self) -> "Conversation":
        return Conversation(self.system, self.roles,
                            [list(m) for m in self.messages],
                            self.sep_style, self.sep, self.sep2,
                            self.version)


conv_templates = {
    "qwen_1_5": Conversation(
        system="You are a helpful assistant.",
        roles=("user", "assistant"), messages=[],
        sep_style=SeparatorStyle.CHATML, version="qwen"),
    "plain": Conversation(
        system="", roles=("", ""), messages=[],
        sep_style=SeparatorStyle.PLAIN, sep="\n"),
    "vicuna_v1": Conversation(
        system="A chat between a curious human and an artificial "
               "intelligence assistant. The assistant gives helpful, "
               "detailed, and polite answers to the human's questions.",
        roles=("USER", "ASSISTANT"), messages=[],
        sep_style=SeparatorStyle.TWO, sep=" ", sep2="</s>",
        version="v1"),
    "llava_llama_2": Conversation(
        system="You are a helpful language and vision assistant.",
        roles=("USER", "ASSISTANT"), messages=[],
        sep_style=SeparatorStyle.LLAMA_2, version="llama_v2"),
    "mpt": Conversation(
        system="", roles=("user", "assistant"), messages=[],
        sep_style=SeparatorStyle.MPT),
}
default_conversation = conv_templates["qwen_1_5"]
