"""Oracle tests: our pure-Python tokenizers vs the HF implementations.

The reference drives BertTokenizer (GroundingDINO text tower,
LSAM/lang_sam/models/gdino.py:10-14), CLIPTokenizer and T5TokenizerFast
(FLUX.1-Kontext, src/foho/preprocess/inpaint.py:41-44) — all importable
offline. We synthesize small vocabs, instantiate both implementations on the
same files, and assert id-level equality on the pipeline's actual prompts
plus adversarial strings (punctuation, accents, CJK, long words, numbers).
"""

import json
import os

import numpy as np
import pytest

from followmyhold_tpu.text.tokenizers import (
    ClipBpeTokenizer,
    UnigramTokenizer,
    WordPieceTokenizer,
    parse_sentencepiece_model,
)

PROMPTS = [
    "water bottle.",
    "Remove hands but keep the water bottle",
    "only hand.",
    "a photo of a HAND!! holding a mug, top-down",
    "naive café glaß 杯子 test",
    "supercalifragilisticexpialidocious word",
    "x " * 40 + "end",
    "123 4.5 no6",
    "  double  spaces\tand\nnewlines ",
]


# ---------------------------------------------------------------------------
# WordPiece vs transformers.BertTokenizer
# ---------------------------------------------------------------------------

BERT_VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] water bottle . remove hands but keep the "
    "only hand a photo of holding mug , ! - top down naive cafe glas ##s 杯 "
    "word x end 1 ##2 ##3 4 5 no ##6 super ##cal ##if double spaces and "
    "newlines re ##move".split()
)


def _hf_bert(tmp_path):
    from transformers import BertTokenizer

    vocab_file = os.path.join(tmp_path, "vocab.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        f.write("\n".join(BERT_VOCAB) + "\n")
    return BertTokenizer(vocab_file), vocab_file


@pytest.mark.parametrize("text", PROMPTS)
def test_wordpiece_matches_bert_tokenizer(tmp_path, text):
    hf, vocab_file = _hf_bert(str(tmp_path))
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    expected = hf(text)["input_ids"]
    got = ours.encode(text)[0].tolist()
    assert got == expected, (text, hf.convert_ids_to_tokens(expected),
                             [BERT_VOCAB[i] for i in got])


def test_wordpiece_long_word_unk(tmp_path):
    hf, vocab_file = _hf_bert(str(tmp_path))
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    text = "a" * 200
    assert ours.encode(text)[0].tolist() == hf(text)["input_ids"]


# ---------------------------------------------------------------------------
# CLIP BPE vs transformers.CLIPTokenizer
# ---------------------------------------------------------------------------

def _clip_files(tmp_path):
    """Small but real BPE vocab: all byte symbols (+</w>), common merges."""
    from followmyhold_tpu.text.tokenizers import _bytes_to_unicode

    chars = list(_bytes_to_unicode().values())
    merges = [
        ("h", "e"), ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
        ("h", "and</w>"), ("e", "r</w>"), ("w", "at"), ("a", "t"),
        ("wat", "er</w>"), ("b", "o"), ("t", "t"), ("bo", "tt"),
        ("l", "e</w>"), ("bott", "le</w>"), ("o", "f</w>"), ("1", "2"),
        ("he", "l"), ("hel", "l"), ("o", "o"),
    ]
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab_file = os.path.join(tmp_path, "vocab.json")
    merges_file = os.path.join(tmp_path, "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in merges)
    return vocab_file, merges_file


@pytest.mark.parametrize("text", PROMPTS + ["hello 1234 water-bottle 'll 'd"])
def test_clip_bpe_matches_clip_tokenizer(tmp_path, text):
    from transformers import CLIPTokenizer

    vocab_file, merges_file = _clip_files(str(tmp_path))
    hf = CLIPTokenizer(vocab_file, merges_file)
    ours = ClipBpeTokenizer.from_files(vocab_file, merges_file)
    expected = hf(text, padding="max_length", max_length=77)["input_ids"]
    got = ours.encode(text, max_len=77)[0].tolist()
    assert got == expected, (text, hf.tokenize(text), ours.tokenize(text))


def test_clip_bpe_truncation(tmp_path):
    from transformers import CLIPTokenizer

    vocab_file, merges_file = _clip_files(str(tmp_path))
    hf = CLIPTokenizer(vocab_file, merges_file)
    ours = ClipBpeTokenizer.from_files(vocab_file, merges_file)
    text = "water bottle " * 40
    expected = hf(text, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
    assert ours.encode(text, max_len=77)[0].tolist() == expected


# ---------------------------------------------------------------------------
# Unigram/SentencePiece vs the `tokenizers` Unigram model (what
# T5TokenizerFast actually runs)
# ---------------------------------------------------------------------------

T5_VOCAB = [
    ("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
    ("▁Remove", -4.1), ("▁hands", -5.2), ("▁but", -3.3), ("▁keep", -4.7),
    ("▁the", -2.1), ("▁water", -4.9), ("▁bottle", -5.5), ("▁", -2.0),
    ("▁a", -2.5), ("▁photo", -6.1), ("▁of", -2.9), ("▁hold", -6.0),
    ("ing", -3.5), ("▁hand", -5.0), ("s", -2.2), ("▁no", -4.0),
    ("▁123", -7.0), ("1", -5.1), ("2", -5.15), ("3", -5.2), ("4", -5.25),
    ("5", -5.3), (".", -3.0), ("▁x", -4.4), ("▁end", -6.2), ("▁w", -4.8),
    ("or", -3.9), ("d", -2.8), ("e", -2.4), ("r", -2.6), ("mov", -6.5),
    ("▁re", -4.2), ("▁double", -7.2), ("▁spaces", -7.4), ("▁and", -3.6),
    ("▁new", -6.6), ("lines", -6.8), ("-", -3.1), ("t", -2.3), ("o", -2.35),
    ("p", -3.2), ("▁down", -6.3), ("!", -3.4), (",", -3.05),
]


def _hf_unigram():
    from tokenizers import Regex, Tokenizer, normalizers, pre_tokenizers, processors
    from tokenizers.models import Unigram

    tok = Tokenizer(Unigram(T5_VOCAB, unk_id=2, byte_fallback=False))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFKC(), normalizers.Replace(Regex(" {2,}"), " ")])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁",
                                                 prepend_scheme="always")
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)])
    return tok


@pytest.mark.parametrize("text", [
    "Remove hands but keep the water bottle",
    "a photo of holding hands",
    "no 12345 word",
    "re mov e the bottle.",
    "x-end, top!down",
    "double  spaces",
    "ZZZ unknown ZZZ chars",
])
def test_unigram_matches_tokenizers_lib(text):
    hf = _hf_unigram()
    ours = UnigramTokenizer(T5_VOCAB, unk_id=2)
    expected = hf.encode(text).ids
    got = ours.encode(text)[0].tolist()
    assert got == expected, (text, hf.encode(text).tokens, ours.tokenize(text))


def test_unigram_from_tokenizer_json(tmp_path):
    spec = {"model": {"type": "Unigram", "unk_id": 2, "vocab": T5_VOCAB}}
    path = os.path.join(str(tmp_path), "tokenizer.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(spec, f, ensure_ascii=False)
    tok = UnigramTokenizer.from_tokenizer_json(path)
    assert tok.encode("keep the bottle")[0].tolist() == \
        UnigramTokenizer(T5_VOCAB, unk_id=2).encode("keep the bottle")[0].tolist()


def test_spiece_protobuf_roundtrip(tmp_path):
    """Serialize a ModelProto with the real sentencepiece wire format (built
    by hand here) and check the minimal parser recovers pieces/scores/types."""
    import struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def piece_msg(piece, score, ptype):
        pb = piece.encode("utf-8")
        sub = b"\x0a" + varint(len(pb)) + pb
        sub += b"\x15" + struct.pack("<f", score)
        sub += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(sub)) + sub

    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁hello", -5.0, 1), ("▁", -2.0, 1), ("lo", -3.0, 1)]
    blob = b"".join(piece_msg(*p) for p in pieces)
    # trailing unknown field (trainer_spec, field 2, len-delimited) is skipped
    blob += b"\x12" + bytes([3]) + b"abc"
    parsed = parse_sentencepiece_model(blob)
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in pieces]
    np.testing.assert_allclose([s for _, s, _ in parsed],
                               [s for _, s, _ in pieces], rtol=1e-6)

    path = os.path.join(str(tmp_path), "spiece.model")
    with open(path, "wb") as f:
        f.write(blob)
    tok = UnigramTokenizer.from_spiece_model(path)
    assert tok.unk_id == 2
    assert tok.tokenize("hello") == ["▁hello"]
