"""ChatML template, label masking, sentinel remap, action parsing."""
import numpy as np

from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.utils.constants import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX)


def test_roundtrip_template():
    tok = ByteTokenizer()
    ids = chatml.encode_message(tok, "user", "hello")
    assert tok.decode(ids) == "<|im_start|>user\nhello<|im_end|>\n"


def test_sentinel_remap():
    tok = ByteTokenizer()
    ids, _ = chatml.tokenize_dialogue(
        tok, [("user", "look <image> and <memory>.")], add_system=False,
        with_labels=False)
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert (ids == MEMORY_TOKEN_INDEX).sum() == 1
    assert tok.image_token_id not in ids.tolist()


def test_label_masking():
    tok = ByteTokenizer()
    ids, labels = chatml.tokenize_dialogue(
        tok, [("user", "go"), ("assistant", "↑↑")], add_system=True)
    # system + user fully masked except unmask set
    unmask = {tok.newline_id, tok.im_start_id, tok.im_end_id}
    n_sys_user = len(chatml.encode_message(tok, "system",
                                           "You are a helpful assistant.")) \
        + len(chatml.encode_message(tok, "user", "go"))
    for i in range(n_sys_user):
        if int(ids[i]) in unmask:
            assert labels[i] == ids[i]
        else:
            assert labels[i] == IGNORE_INDEX
    # assistant turn fully unmasked
    assert (labels[n_sys_user:] == ids[n_sys_user:]).all()
    # decoded assistant ids contain the arrows
    assert "↑↑" in tok.decode(ids[n_sys_user:].tolist())


def test_parse_actions():
    assert chatml.parse_actions("↑↑←STOP") == [1, 1, 2, 0]
    assert chatml.parse_actions("The action is →, then ↑.") == [3, 1]
    assert chatml.parse_actions("no actions here") == []


def test_actions_to_text_roundtrip():
    seq = [1, 1, 2, 3, 0]
    assert chatml.parse_actions(chatml.actions_to_text(seq)) == seq


def test_observation_prompt():
    assert chatml.observation_prompt(None, "") == "you can see <image>."
    out = chatml.observation_prompt(None, "Task text.")
    assert out == "Task text. you can see <image>."
    rng = np.random.default_rng(0)
    assert chatml.observation_prompt(rng, "").endswith("<image>.")
