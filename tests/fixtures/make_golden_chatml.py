"""Regenerate tests/fixtures/golden_chatml_ids.json (run from repo
root after an intentional tokenizer/template change)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import load_tokenizer

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
from test_tokenizer_golden import DIALOGUE, FIXTURE  # noqa: E402

tok = load_tokenizer(FIXTURE)
ids, labels = chatml.tokenize_dialogue(tok, DIALOGUE, add_system=True,
                                       with_labels=True)
out = {"input_ids": ids.tolist(), "labels": labels.tolist(),
       "generation_prompt": chatml.generation_prompt(tok)}
with open(os.path.join(HERE, "golden_chatml_ids.json"), "w") as f:
    json.dump(out, f)
print("wrote golden_chatml_ids.json:", len(out["input_ids"]), "ids")
