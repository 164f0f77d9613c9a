"""Committed golden-vector tests pinning both from-scratch tokenizers to
independent reference implementations (round-1 VERDICT item 6).

The fixture (tests/fixtures/tokenizer_goldens.json, regenerate with
gen_tokenizer_goldens.py) holds phrase → token-id pairs produced by:

- ``transformers.CLIPTokenizer`` (the HF reference the upstream project
  delegates to, video_search_overhaul.py:283-284) over a locally-learned
  byte-level BPE vocab, and
- the HF ``tokenizers`` Rust ``Unigram`` model behind a Metaspace
  pre-tokenizer (the fast-T5/SigLIP structure) over a locally-scored
  unigram piece inventory.

These tests require byte-exact agreement and run with NO tokenizer
libraries installed — the fixture is the oracle.
"""

import json
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "tokenizer_goldens.json"


@pytest.fixture(scope="module")
def goldens():
    return json.loads(FIXTURE.read_text())


def test_clip_bpe_matches_hf_reference(goldens):
    from video_quierer_tpu.models.clip.tokenizer import CLIPBPETokenizer

    g = goldens["clip_bpe"]
    merges = [tuple(m.split(" ")) for m in g["merges"]]
    tok = CLIPBPETokenizer(g["vocab"], merges)
    bad = []
    for case in g["goldens"]:
        got = tok.encode_ids(case["text"])
        if got != case["ids"]:
            bad.append((case["text"], got, case["ids"]))
    assert not bad, f"{len(bad)} phrase(s) diverge from HF CLIPTokenizer:" \
                    f" {bad[:3]}"


def test_clip_bpe_batch_framing(goldens):
    """__call__ framing on golden ids: SOT + ids + EOT, EOT-padded."""
    import numpy as np
    from video_quierer_tpu.models.clip.tokenizer import CLIPBPETokenizer

    g = goldens["clip_bpe"]
    merges = [tuple(m.split(" ")) for m in g["merges"]]
    tok = CLIPBPETokenizer(g["vocab"], merges)
    # the framing constants are the REAL CLIP ids; this fixture vocab is
    # smaller, so only check structure via encode_ids + manual framing
    case = g["goldens"][0]
    ids = tok.encode_ids(case["text"])
    batch = tok([case["text"]])
    assert batch.shape[1] == 77
    got = batch[0]
    assert list(got[1: 1 + len(ids)]) == ids
    assert int(np.argmax(got)) in (0, 1 + len(ids))  # SOT/EOT placement


def test_siglip_spm_matches_rust_unigram(goldens):
    from tests.test_siglip_spm import make_spiece
    from video_quierer_tpu.models.siglip.spm import (
        UnigramEncoder,
        load_model_proto,
        normalize_nmt_nfkc,
    )

    g = goldens["siglip_spm"]
    pieces = [(p, float(s), int(t)) for p, s, t in g["pieces"]]
    model = load_model_proto(make_spiece(pieces))
    enc = UnigramEncoder(model)
    bad = []
    for case in g["goldens"]:
        norm = normalize_nmt_nfkc(
            case["norm"], add_dummy_prefix=model.add_dummy_prefix,
            remove_extra_whitespaces=True, escape_whitespaces=True)
        got = enc.encode(norm)
        if got != case["ids"]:
            bad.append((case["text"], got, case["ids"]))
    assert not bad, f"{len(bad)} phrase(s) diverge from Rust Unigram: " \
                    f"{bad[:3]}"
