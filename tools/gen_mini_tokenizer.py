"""Generate the committed miniature REAL-FORMAT tokenizer fixture
(fixtures/mini_unigram_tokenizer.json).

The file is shaped exactly like a HuggingFace *fast-tokenizer*
serialization (``tokenizer.backend_tokenizer.to_str()``) of a
sentencepiece-UNIGRAM model — the same structure
``tools/export_tokenizer.py`` consumes when exporting a real
DeBERTa-v3 checkpoint: top-level ``model`` with ``type: "Unigram"``,
``unk_id``, and ``vocab`` as an id-ordered list of
``[piece, log_prob]`` pairs (▁-marked word-start pieces, negative
unigram log-probs). Only the SIZE is miniature (a few hundred pieces
instead of 128k); every byte of structure the exporter touches is the
real contract, so the export path and the engine's Viterbi
segmentation (encoder.UnigramVocab) are exercised end-to-end
in-sandbox without ``transformers``.

Piece inventory: the four sentencepiece specials at the conventional
DeBERTa-v3 ids ([PAD]=0 [CLS]=1 [SEP]=2 [UNK]=3, matching the
engine's reserved PAD/CLS/SEP rows; unk_id=3), then common English
word/affix pieces and full ASCII coverage (▁-marked and continuation
single characters) so ordinary text segments without unk fallback —
characters outside the inventory exercise the fallback, exactly like
a real vocab meeting unseen unicode. Scores are deterministic
frequency-ranked log-probs. Ids stay far below the test double's
embedding vocab (2048), mirroring the exporter's --vocab-limit
contract.

Usage: python tools/gen_mini_tokenizer.py   (rewrites the fixture)
"""

from __future__ import annotations

import json
import string
from pathlib import Path

WORDS = [
    "the", "of", "and", "in", "to", "a", "is", "was", "for", "on",
    "as", "with", "by", "at", "from", "that", "it", "his", "her", "an",
    "be", "are", "were", "or", "which", "this", "also", "has", "had",
    "its", "but", "not", "he", "she", "they", "first", "one", "two",
    "new", "city", "state", "united", "born", "american", "university",
    "national", "world", "year", "years", "time", "film", "album",
    "song", "band", "team", "season", "league", "company", "president",
]
AFFIXES = [
    "s", "ing", "ed", "er", "ly", "tion", "al", "ic", "an", "es",
    "est", "ment", "ness", "ity", "ism", "ist", "ous", "ive", "able",
    "land", "ville", "ton", "berg", "son",
]


def build_state() -> dict:
    vocab: list[list[object]] = [
        ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0], ["[UNK]", 0.0],
    ]
    seen = {p for p, _ in vocab}

    def add(piece: str, score: float) -> None:
        # real unigram vocabs are duplicate-free; first spelling wins
        if piece not in seen:
            seen.add(piece)
            vocab.append([piece, score])

    # word-start pieces for common words: high log-prob, rank-decayed
    for i, w in enumerate(WORDS):
        add("▁" + w, -6.0 - 0.05 * i)
    # continuation affixes
    for i, a in enumerate(AFFIXES):
        add(a, -8.0 - 0.05 * i)
    # full printable-ASCII coverage: ▁c (word-start) and c (continuation)
    chars = string.ascii_letters + string.digits + string.punctuation
    for i, c in enumerate(chars):
        add("▁" + c, -11.0 - 0.01 * i)
        add(c, -10.0 - 0.01 * i)
    # the bare word-boundary piece (real unigram vocabs carry it)
    add("▁", -11.5)
    # HF fast-tokenizer serialization shape (the keys the real
    # to_str() emits around the model; the exporter reads only `model`)
    return {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": {"type": "Precompiled", "precompiled_charsmap": ""},
        "pre_tokenizer": {
            "type": "Metaspace", "replacement": "▁",
            "prepend_scheme": "always", "split": True,
        },
        "model": {"type": "Unigram", "unk_id": 3, "vocab": vocab},
    }


def main() -> None:
    dest = Path(__file__).resolve().parent.parent / (
        "fixtures/mini_unigram_tokenizer.json"
    )
    state = build_state()
    dest.write_text(json.dumps(state, ensure_ascii=False, indent=1))
    print(f"wrote {dest}: {len(state['model']['vocab'])} pieces")


if __name__ == "__main__":
    main()
