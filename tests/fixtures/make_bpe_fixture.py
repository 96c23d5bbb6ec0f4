"""Generate the committed byte-level-BPE tokenizer fixture
(tests/fixtures/bpe_tokenizer/) — a real HF fast tokenizer with the
same STRUCTURE as Qwen2's (byte-level BPE, ChatML specials,
<image>/<memory> registered at runtime by HFTokenizerAdapter) so the
tokenizer-dependent code paths are golden-testable offline. The
production Qwen2 vocab itself cannot ship here; ids differ, mechanics
(byte-level merges, boundary behavior around specials) are identical.

Run from the repo root:  python tests/fixtures/make_bpe_fixture.py
Deterministic given the corpus below; the output is committed.
"""
import json
import os

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, \
    processors, trainers

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bpe_tokenizer")

CORPUS = [
    "You are a helpful assistant.",
    "You are an autonomous navigation assistant. Your task is to walk "
    "past the table and stop at the red door. Devise an action sequence "
    "to follow the instruction using the four actions: TURN LEFT (←) "
    "or TURN RIGHT (→) by 15 degrees, MOVE FORWARD (↑) by 25 "
    "centimeters, or STOP.",
    "These are your historical observations.",
    "you can see in front of you is there is you can spot ",
    "you are toward the ahead of you is in your sight is ",
    "system\nuser\nassistant\n",
    "↑↑←→ STOP ↑←←→→",
    "walk down the hallway and stop by the second door on the left "
    "near the picture frame",
] * 4


def main():
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.post_processor = processors.ByteLevel(trim_offsets=False)
    trainer = trainers.BpeTrainer(
        vocab_size=640, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[])
    tok.train_from_iterator(CORPUS, trainer)
    tok.add_special_tokens(["<|endoftext|>", "<|im_start|>",
                            "<|im_end|>"])

    os.makedirs(OUT, exist_ok=True)
    tok.save(os.path.join(OUT, "tokenizer.json"))
    with open(os.path.join(OUT, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "model_max_length": 4096,
            "bos_token": None,
            "eos_token": "<|im_end|>",
            "pad_token": "<|endoftext|>",
            "additional_special_tokens": ["<|im_start|>", "<|im_end|>"],
        }, f, indent=1)
    print(f"wrote fixture to {OUT} "
          f"(vocab {tok.get_vocab_size()})")


if __name__ == "__main__":
    main()
