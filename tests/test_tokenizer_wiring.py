"""Wiring tests: real-vocab tokenizers gate the hash fallback.

VERDICT r2 weak #6: simple_tokenize must not silently degrade runs with real
converted weights. These tests pin the contract: vocab installed -> real ids;
real params + no vocab -> hard error; neither -> hash fallback stays usable.
"""

import os

import numpy as np
import pytest


@pytest.fixture
def assets(tmp_path, monkeypatch):
    monkeypatch.setenv("FOHO_TPU_ASSETS", str(tmp_path))
    return str(tmp_path)


def _install_gdino_vocab(assets):
    d = os.path.join(assets, "tokenizers", "gdino")
    os.makedirs(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "water", "bottle", ".",
             "only", "hand"]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    return vocab


def test_gdino_real_vocab_used(assets):
    from followmyhold_tpu.models.gdino import tokenize_prompt

    _install_gdino_vocab(assets)
    ids = tokenize_prompt("Water Bottle")   # caption-normalized + "." appended
    assert ids.tolist() == [[2, 4, 5, 6, 3]]


def test_gdino_hash_fallback_without_params(assets):
    from followmyhold_tpu.models.gdino import tokenize_prompt

    ids = tokenize_prompt("water bottle.")
    assert ids[0, 0] == 101 and ids[0, -1] == 102   # BERT CLS/SEP framing


def test_gdino_hard_fails_with_real_params_no_vocab(assets, monkeypatch):
    from followmyhold_tpu.models.gdino import tokenize_prompt

    os.makedirs(os.path.join(assets, "params"))
    with open(os.path.join(assets, "params", "gdino.msgpack"), "wb") as f:
        f.write(b"x")
    with pytest.raises(RuntimeError, match="vocab"):
        tokenize_prompt("water bottle.")
    monkeypatch.setenv("FOHO_ALLOW_HASH_TOKENIZER", "1")
    assert tokenize_prompt("water bottle.").shape[0] == 1


def test_flux_prompt_real_tokenizers(assets):
    import json

    from followmyhold_tpu.models.clip_text import CLIP_TINY_TEST
    from followmyhold_tpu.models.t5 import T5_TINY_TEST
    from followmyhold_tpu.preprocess.inpaint import tokenize_flux_prompt
    from followmyhold_tpu.text.tokenizers import _bytes_to_unicode

    cd = os.path.join(assets, "tokenizers", "flux_clip")
    td = os.path.join(assets, "tokenizers", "flux_t5")
    os.makedirs(cd)
    os.makedirs(td)
    chars = list(_bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(cd, "vocab.json"), "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(cd, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(td, "tokenizer.json"), "w") as f:
        json.dump({"model": {"type": "Unigram", "unk_id": 2, "vocab": [
            ["<pad>", 0.0], ["</s>", 0.0], ["<unk>", 0.0],
            ["▁remove", -5.0], ["▁hands", -5.0], ["▁", -2.0],
            ["r", -3.0], ["e", -3.0], ["m", -3.0], ["o", -3.0], ["v", -3.0],
        ]}}, f, ensure_ascii=False)

    clip_ids, t5_ids = tokenize_flux_prompt("remove hands",
                                            CLIP_TINY_TEST, T5_TINY_TEST)
    assert clip_ids.shape == (1, 77)
    assert t5_ids.shape == (1, 512)
    assert t5_ids[0, 0] == 3 and t5_ids[0, 1] == 4 and t5_ids[0, 2] == 1
    assert clip_ids[0, 0] == vocab["<|startoftext|>"]


def test_flux_hard_fails_with_real_params_no_vocab(assets):
    from followmyhold_tpu.models.clip_text import CLIP_TINY_TEST
    from followmyhold_tpu.models.t5 import T5_TINY_TEST
    from followmyhold_tpu.preprocess.inpaint import tokenize_flux_prompt

    os.makedirs(os.path.join(assets, "params"))
    with open(os.path.join(assets, "params", "flux_t5.msgpack"), "wb") as f:
        f.write(b"x")
    with pytest.raises(RuntimeError, match="tokenizer"):
        tokenize_flux_prompt("remove hands", CLIP_TINY_TEST, T5_TINY_TEST)


def test_flux_hash_fallback_without_params(assets):
    from followmyhold_tpu.models.clip_text import CLIP_TINY_TEST
    from followmyhold_tpu.models.t5 import T5_TINY_TEST
    from followmyhold_tpu.preprocess.inpaint import tokenize_flux_prompt

    clip_ids, t5_ids = tokenize_flux_prompt("remove hands",
                                            CLIP_TINY_TEST, T5_TINY_TEST)
    assert clip_ids[0, -1] == CLIP_TINY_TEST.eos_token_id
    assert (t5_ids < T5_TINY_TEST.vocab_size).all()
