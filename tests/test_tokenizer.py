"""Tokenizer tests: BPE algorithm on a handcrafted vocab, HF parity when
transformers' tokenizer can be built locally, and the offline hash fallback.
"""

import json

import numpy as np
import pytest

from video_quierer_tpu.models.clip.tokenizer import (
    CONTEXT_LENGTH,
    EOT,
    SOT,
    CLIPBPETokenizer,
    HashTokenizer,
    _bytes_to_unicode,
)


def test_hash_tokenizer_shape_and_determinism():
    tok = HashTokenizer()
    a = tok("a dog runs")
    b = tok("a dog runs")
    assert a.shape == (1, CONTEXT_LENGTH)
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == SOT
    assert EOT in a[0]
    # EOT-padding: argmax over ids finds the FIRST EOT (pooling invariant)
    first_eot = int(np.argmax(a[0]))
    assert a[0, first_eot] == EOT
    assert all(a[0, first_eot:] == EOT)


def test_hash_tokenizer_distinct_words():
    tok = HashTokenizer()
    assert tok.encode_ids("dog") != tok.encode_ids("cat")
    assert tok.encode_ids("dog dog") == tok.encode_ids("dog") * 2


def test_bpe_merges_applied(tmp_path):
    # vocab: single chars + end-of-word forms + one merged token
    chars = ["l", "o", "w", "e", "r"]
    vocab = {c: i for i, c in enumerate(chars)}
    n = len(vocab)
    for i, c in enumerate(chars):
        vocab[c + "</w>"] = n + i
    vocab["lo"] = 10
    vocab["low"] = 11
    vocab["er</w>"] = 12
    vocab["lower</w>"] = 13
    merges = [("l", "o"), ("lo", "w"), ("e", "r</w>"), ("low", "er</w>")]
    tok = CLIPBPETokenizer(vocab, merges)
    assert tok.encode_ids("lower") == [13]
    # "low" alone: merge l+o→lo applies, but (lo, w) can't — the final char
    # is the distinct token 'w</w>' → ['lo', 'w</w>']
    assert tok.encode_ids("low") == [10, vocab["w</w>"]]
    assert tok.encode_ids("low er") == [10, vocab["w</w>"], 12]


def test_bpe_truncation():
    tok = HashTokenizer()
    long = " ".join(["word"] * 500)
    ids = tok(long)
    assert ids.shape == (1, CONTEXT_LENGTH)
    assert ids[0, -1] == EOT


def test_bytes_to_unicode_reversible():
    m = _bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_hf_tokenizer_parity(tmp_path):
    """If transformers can construct a CLIPTokenizer from local files, our
    BPE must produce identical ids."""
    transformers = pytest.importorskip("transformers")
    # Build a tiny shared vocab + merges file pair.
    chars = list("abcdehlorstuw ")
    base = {}
    for c in "abcdehlorstuw":
        base[c] = len(base)
    for c in "abcdehlorstuw":
        base[c + "</w>"] = len(base)
    merges = [("h", "e</w>"), ("l", "o"), ("lo", "w</w>"), ("c", "a"),
              ("ca", "t</w>")]
    for m in merges:
        base["".join(m)] = len(base)
    base["<|startoftext|>"] = len(base)
    base["<|endoftext|>"] = len(base)

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(base))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")

    hf_tok = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))
    ours = CLIPBPETokenizer.from_dir(tmp_path)
    for text in ["he low cat", "cat cat hat", "a b c", "lol"]:
        ref = hf_tok(text)["input_ids"][1:-1]  # strip HF's sot/eot
        got = ours.encode_ids(text)
        assert got == ref, (text, got, ref)
