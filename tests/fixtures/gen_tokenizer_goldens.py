#!/usr/bin/env python3
"""Generate committed tokenizer golden vectors (round-1 VERDICT item 6).

Real pretrained vocab files cannot be downloaded in this image (zero
egress), so the goldens pin our tokenizers to INDEPENDENT reference
implementations over locally-learned vocabularies:

- CLIP BPE: a byte-level BPE vocab learned here with the classic
  merge-frequency loop (the same construction ``from_bpe_file`` expects),
  tokenized by ``transformers.CLIPTokenizer`` — the exact HF reference
  implementation the upstream project delegates to
  (video_search_overhaul.py:283-284).
- SigLIP SentencePiece: a unigram piece inventory scored here, tokenized
  by the HF ``tokenizers`` Rust ``Unigram`` model behind a Metaspace
  pre-tokenizer (the fast-T5/SigLIP tokenizer structure).

Run from the repo root:  python tests/fixtures/gen_tokenizer_goldens.py
Writes tokenizer_goldens.json next to this script. Deterministic.
"""

from __future__ import annotations

import collections
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from video_quierer_tpu.models.clip.tokenizer import _bytes_to_unicode

CORPUS = """
the quick brown fox jumps over the lazy dog a video of a cat sitting on
a red sofa people walking through a busy street at night sunset over the
ocean with waves crashing a person riding a bicycle down a mountain trail
two dogs playing fetch in the park close up of rain drops on a window
children laughing and running in a playground a chef cooking pasta in a
restaurant kitchen aerial view of a city skyline at dawn slow motion shot
of a hummingbird drinking nectar the cat sat on the mat and then the dog
sat on the cat video search engine queries often describe scenes actions
objects colors and moods like happy sad bright dark crowded empty
""".split()

PHRASES = [
    "a dog playing in the park",
    "the quick brown fox jumps over the lazy dog",
    "sunset over the ocean",
    "A CAT ON A RED SOFA",          # case folding
    "  whitespace   mess \t here ", # cleanup
    "it's the dog's toy",           # contractions
    "rain, drops; on: a window!",   # punctuation runs
    "scene number 42 frame 1234",   # per-digit splitting
    "café naïve résumé",            # non-ASCII letters
    "emoji 🐕 in a query",          # byte fallback
    "snake_case and-hyphens",
    "don't won't can't",
    "a", "dog", "",
    "the the the the",
    "video of a chef cooking pasta",
    "aerial view of a city skyline at dawn",
    "slow motion hummingbird",
    "price is $19.99 today",
    "50% off!",
    "hello...world",
    "tabs\tand\nnewlines",
    "ALL CAPS QUERY",
    "MiXeD CaSe QuErY",
    "query with trailing space ",
    " leading space query",
    "double  space  query",
    "a video of scene number 7 with people",
    "two dogs playing fetch",
    "children laughing and running",
    "close up of rain drops",
    "busy street at night",
    "mountain trail ride",
    "crowded empty bright dark",
    "happy sad moods",
    "the end.",
    "question? answer!",
    "quote \"inside\" text",
    "parenthetical (remark) here",
    "semi;colon:test",
    "числа and 漢字 mixed",          # multi-script byte fallback
    "ünïcödé àccénts",
    "x",
    "1",
    "12345",
    "a1b2c3",
    "the-quick-brown-fox",
    "over_the_lazy_dog",
    "fox... dog!!! cat???",
    "new\nline\nquery",
]


# ---------------------------------------------------------------------------
# CLIP BPE: learn merges (classic BPE loop), emit vocab/merges, golden via
# transformers.CLIPTokenizer
# ---------------------------------------------------------------------------

def learn_bpe(words, n_merges: int):
    """Classic BPE merge learning over whole words with </w> end-of-word."""
    b2u = _bytes_to_unicode()
    freqs = collections.Counter(words)
    seqs = {
        w: tuple(
            [b2u[b] for b in w.encode("utf-8")][:-1]
            + [b2u[w.encode("utf-8")[-1]] + "</w>"])
        for w in freqs
    }
    merges = []
    for _ in range(n_merges):
        pair_counts = collections.Counter()
        for w, f in freqs.items():
            seq = seqs[w]
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += f
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographic
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = "".join(best)
        for w in seqs:
            seq, out, i = seqs[w], [], 0
            while i < len(seq):
                if (i < len(seq) - 1
                        and (seq[i], seq[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def gen_clip():
    import tempfile

    from transformers import CLIPTokenizer

    merges = learn_bpe([w.lower() for w in CORPUS], 400)
    chars = list(_bytes_to_unicode().values())
    vocab_list = chars + [c + "</w>" for c in chars]
    vocab_list += ["".join(m) for m in merges]
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_list)}

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        (td / "vocab.json").write_text(json.dumps(vocab))
        (td / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
        hf = CLIPTokenizer(str(td / "vocab.json"), str(td / "merges.txt"))
        goldens = []
        for p in PHRASES:
            ids = hf(p, add_special_tokens=False)["input_ids"]
            goldens.append({"text": p, "ids": ids})
    return {"vocab": vocab, "merges": [" ".join(m) for m in merges],
            "sot": vocab["<|startoftext|>"], "eot": vocab["<|endoftext|>"],
            "goldens": goldens}


# ---------------------------------------------------------------------------
# SigLIP SentencePiece unigram: score pieces from corpus stats, golden via
# the Rust Unigram model (tokenizers)
# ---------------------------------------------------------------------------

def build_pieces():
    import math

    text = " ".join(CORPUS + [p.lower() for p in PHRASES])
    words = collections.Counter(text.split())
    # candidate pieces: whole words (with ▁), prefixes, and all chars
    cand = collections.Counter()
    for w, f in words.items():
        mw = "▁" + w
        cand[mw] += f * len(w)
        for i in range(2, len(mw)):
            cand[mw[:i]] += f
            cand[w[i - 1:]] += 1
        for ch in mw:
            cand[ch] += f
    total = sum(cand.values())
    keep = [p for p, _ in cand.most_common(800)]
    # every single char must be present for closure
    chars = sorted({c for w in words for c in "▁" + w})
    for c in chars:
        if c not in keep:
            keep.append(c)
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2)]
    seen = set()
    for p in keep:
        if p in seen or p in ("<pad>", "</s>", "<unk>"):
            continue
        seen.add(p)
        score = math.log(cand[p] / total) - 0.1 * len(p)
        pieces.append((p, round(score, 4), 1))
    return pieces


def gen_siglip():
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers import pre_tokenizers, normalizers

    pieces = build_pieces()
    vocab = [(p, s) for p, s, _ in pieces]
    tok = Tokenizer(Unigram(vocab, unk_id=2, byte_fallback=False))
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first")
    goldens = []
    for p in PHRASES:
        text = " ".join(p.lower().split())  # match spm whitespace collapse
        if not text:
            goldens.append({"text": p, "norm": text, "ids": []})
            continue
        ids = tok.encode(text).ids
        goldens.append({"text": p, "norm": text, "ids": ids})
    return {"pieces": [[p, s, t] for p, s, t in pieces],
            "unk_id": 2, "goldens": goldens}


def main():
    out = {
        "clip_bpe": gen_clip(),
        "siglip_spm": gen_siglip(),
    }
    path = Path(__file__).parent / "tokenizer_goldens.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path} "
          f"({len(out['clip_bpe']['goldens'])} CLIP phrases, "
          f"{len(out['siglip_spm']['goldens'])} SigLIP phrases, "
          f"{len(out['clip_bpe']['vocab'])} BPE vocab, "
          f"{len(out['siglip_spm']['pieces'])} SPM pieces)")


if __name__ == "__main__":
    main()
