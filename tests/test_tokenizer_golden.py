"""Real-BPE-tokenizer golden tests: the HF adapter path + ChatML
construction verified against HF's own apply_chat_template with the
reference's template string (reference:
streamvln/dataset/vln_action_dataset.py:229-307), on the committed
byte-level BPE fixture (tests/fixtures/bpe_tokenizer — same structure
as Qwen2's tokenizer, incl. the newline token landing on id 198)."""
import json
import os

import numpy as np
import pytest

from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import HFTokenizerAdapter, \
    load_tokenizer
from streamvln_tpu.utils.constants import (IGNORE_INDEX,
                                           IMAGE_TOKEN_INDEX,
                                           MEMORY_TOKEN_INDEX)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "bpe_tokenizer")
GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "golden_chatml_ids.json")

# the reference's exact per-message template
# (vln_action_dataset.py:251)
REF_CHAT_TEMPLATE = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + "
    "'\n' + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}")

DIALOGUE = [
    ("user", "You are an autonomous navigation assistant. Your task is "
             "to walk past the table and stop at the red door. "
             "you can see <image>."),
    ("assistant", "↑↑←→"),
    ("user", "you can see <image>."),
    ("assistant", "↑↑ STOP"),
]


@pytest.fixture(scope="module")
def tok():
    t = load_tokenizer(FIXTURE)
    assert isinstance(t, HFTokenizerAdapter)
    return t


def test_adapter_special_ids(tok):
    assert tok.newline_id == 198      # byte-level 'Ċ', Qwen2 quirk
    assert tok.im_start_id != tok.im_end_id
    assert tok.image_token_id not in (tok.im_start_id, tok.im_end_id)
    assert tok.encode("<image>") == [tok.image_token_id]
    assert tok.encode("<memory>") == [tok.memory_token_id]
    assert tok.encode("\n") == [tok.newline_id]


def test_encode_message_matches_apply_chat_template(tok):
    hf = tok._tok
    hf.chat_template = REF_CHAT_TEMPLATE
    for role, content in [
            ("system", "You are a helpful assistant."),
            ("user", "you can see <image>. Where to?"),
            ("user", " These are your historical observations "
                     "<memory>. you can spot <image>."),
            ("assistant", "↑←→ STOP"),
    ]:
        ref = hf.apply_chat_template(
            [{"role": role, "content": content}])
        ours = chatml.encode_message(tok, role, content)
        assert ours == list(ref), (role, content)


def test_generation_prompt_matches_apply_chat_template(tok):
    hf = tok._tok
    hf.chat_template = REF_CHAT_TEMPLATE
    msgs = [{"role": "user", "content": "hello"}]
    with_gen = hf.apply_chat_template(msgs, add_generation_prompt=True)
    without = hf.apply_chat_template(msgs)
    assert chatml.generation_prompt(tok) == list(with_gen[len(without):])


def test_dialogue_ids_and_labels_match_reference_semantics(tok):
    hf = tok._tok
    hf.chat_template = REF_CHAT_TEMPLATE

    ids, labels = chatml.tokenize_dialogue(tok, DIALOGUE,
                                           add_system=True,
                                           with_labels=True)

    # reference: system turn + per-turn apply_chat_template, concat
    ref_ids, ref_labels = [], []
    sys_ids = hf.apply_chat_template(
        [{"role": "system", "content": "You are a helpful assistant."}])
    ref_ids += list(sys_ids)
    ref_labels += [IGNORE_INDEX] * len(sys_ids)
    for role, content in DIALOGUE:
        enc = list(hf.apply_chat_template(
            [{"role": role, "content": content}]))
        ref_ids += enc
        ref_labels += (enc if role == "assistant"
                       else [IGNORE_INDEX] * len(enc))
    unmask = {198, tok.im_start_id, tok.im_end_id}
    for i, t in enumerate(ref_ids):
        if t in unmask:
            ref_labels[i] = t
        if t == tok.image_token_id:
            ref_ids[i] = IMAGE_TOKEN_INDEX
        if t == tok.memory_token_id:
            ref_ids[i] = MEMORY_TOKEN_INDEX

    assert ids.tolist() == ref_ids
    assert labels.tolist() == ref_labels
    assert IMAGE_TOKEN_INDEX in ids.tolist()


def test_action_glyph_roundtrip(tok):
    text = chatml.actions_to_text([1, 1, 2, 3, 0])
    ids = tok.encode(text)
    assert chatml.parse_actions(tok.decode(ids)) == [1, 1, 2, 3, 0]


def test_golden_ids_pinned(tok):
    """Regression pin: committed golden ids for the fixed dialogue.
    Regenerate with tests/fixtures/make_golden_chatml.py after any
    intentional tokenizer/template change."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    ids, labels = chatml.tokenize_dialogue(tok, DIALOGUE,
                                           add_system=True,
                                           with_labels=True)
    assert ids.tolist() == golden["input_ids"]
    assert labels.tolist() == golden["labels"]
    gen = chatml.generation_prompt(tok)
    assert gen == golden["generation_prompt"]
