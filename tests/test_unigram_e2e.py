"""The real-tokenizer seam, end to end in-sandbox: the committed
miniature REAL-FORMAT fast-tokenizer fixture is exported through the
real exporter path (tools/export_tokenizer.export_from_state — the
same function a DeBERTa-v3 checkpoint goes through), loaded via
``GLIREL_TOKENIZER_VOCAB``, and driven through the FULL Spark neural
pipeline (pipeline.triples_neural) in a subprocess whose JVM inherits
the variable — the exact channel a cluster run uses. With the real
exported pair this becomes RUNBOOK_REAL_CHECKPOINT.md step 3."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
FIXTURE = ROOT / "fixtures/mini_unigram_tokenizer.json"


def _export(tmp_path) -> str:
    sys.path.insert(0, str(ROOT / "tools"))
    from export_tokenizer import export_from_state

    dest = str(tmp_path / "mini_vocab.json")
    export_from_state(json.loads(FIXTURE.read_text()), dest, vocab_limit=2048)
    return dest


def test_export_from_state_contract(tmp_path):
    """Exporter + Viterbi segmentation over the miniature real-format
    pair: ids stay under the embedding vocab, whole-word pieces beat
    character chains, unseen characters take the unk fallback."""
    from glirel_spark.model.encoder import UnigramVocab

    dest = _export(tmp_path)
    d = json.loads(Path(dest).read_text())
    assert d["unk_id"] == 3
    assert all(i < 2048 for i, _ in d["pieces"].values())
    # the specials sit at the conventional sentencepiece ids
    assert d["pieces"]["[PAD]"][0] == 0 and d["pieces"]["[CLS]"][0] == 1

    v = UnigramVocab.load(dest)
    the_id = d["pieces"]["▁the"][0]
    assert v.segment("the") == [the_id]  # one whole-word piece
    ing = v.segment("running")
    assert ing[-1] == d["pieces"]["ing"][0]  # affix piece wins the tail
    assert all(pid != 3 for pid in v.segment("Einstein"))  # ASCII covered
    assert 3 in v.segment("naïve")  # ï -> unk fallback
    # memoization returns the identical segmentation
    assert v.segment("the") == v.segment("the")


def test_unigram_vocab_e2e_through_triples_neural(tmp_path):
    """Subprocess run of tools/run_unigram_e2e.py with the exported
    vocab active: the executors' unigram path must agree bitwise with
    the outside-Spark replay on the full triples_neural output."""
    dest = _export(tmp_path)
    env = dict(os.environ, GLIREL_TOKENIZER_VOCAB=dest)
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools/run_unigram_e2e.py"),
         "/root/testdata/sf0.001", "24"],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["agree"] is True and out["rows"] > 0


def test_unigram_vocab_changes_the_encoding(tmp_path):
    """Sensitivity: with the vocab active the piece-id stream differs
    from the stand-in chunker — the seam is live, not decorative."""
    from glirel_spark.model import encoder

    dest = _export(tmp_path)
    words = ["the", "president", "of", "France"]
    base_ids, base_wids = encoder.encode_words(words)
    os.environ["GLIREL_TOKENIZER_VOCAB"] = dest
    try:
        uni_ids, uni_wids = encoder.encode_words(words)
    finally:
        del os.environ["GLIREL_TOKENIZER_VOCAB"]
    assert list(base_wids) != list(uni_wids) or list(base_ids) != list(uni_ids)
    # and the standin path is restored once the variable is gone
    again_ids, _ = encoder.encode_words(words)
    assert list(again_ids) == list(base_ids)
