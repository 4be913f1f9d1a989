"""Sequence packing (token_blocks), RAG chunking (doc_chunks), and
quality stratification (quality_buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark import config
from glirel_spark.operators import packing, textstats


def _docs_tokens(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<string>")


def test_token_blocks_hand_layout(spark):
    # d1: 2 tokens (sl=3), d2: 5 (sl=6), d3: 1 (sl=2) -> 11 positions,
    # blocks of 4: [0,4) [4,8) [8,11)
    d = _docs_tokens(
        spark,
        [("d1", ["a", "b"]), ("d2", ["c", "d", "e", "f", "g"]), ("d3", ["h"])],
    )
    out = {r["block_id"]: r for r in packing.token_blocks(d, block=4).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["n_positions"], out[0]["n_docs"]) == (4, 2)
    assert (out[0]["first_doc"], out[0]["last_doc"]) == ("d1", "d2")
    assert (out[1]["n_positions"], out[1]["n_docs"]) == (4, 1)
    assert (out[2]["n_positions"], out[2]["n_docs"]) == (3, 2)
    assert (out[2]["first_doc"], out[2]["last_doc"]) == ("d2", "d3")


def test_token_blocks_partitioning_invariant(spark):
    rows = [(f"d{i:03d}", ["t"] * (1 + (i * 7) % 13)) for i in range(40)]
    d = _docs_tokens(spark, rows)
    a = sorted(packing.token_blocks(d.repartition(1), block=16).collect())
    b = sorted(packing.token_blocks(d.repartition(7), block=16).collect())
    assert a == b
    # conservation + every block full except the last
    total = sum(len(t) + 1 for _, t in rows)
    assert sum(r["n_positions"] for r in a) == total
    last = max(r["block_id"] for r in a)
    assert all(r["n_positions"] == 16 for r in a if r["block_id"] != last)
    assert {r["block_id"] for r in a} == set(range(last + 1))


def test_doc_chunks_windows_and_hash(spark):
    d = _docs_tokens(spark, [("d1", ["aa", "bb", "cc", "dd", "ee"]), ("d2", ["x"])])
    out = packing.doc_chunks(d, w=3, stride=2).collect()
    by = {(r["doc_id"], r["chunk_id"]): r for r in out}
    assert set(by) == {("d1", 0), ("d1", 1), ("d2", 0)}
    assert (by[("d1", 0)]["start"], by[("d1", 0)]["chunk_len"]) == (0, 3)
    assert (by[("d1", 1)]["start"], by[("d1", 1)]["chunk_len"]) == (2, 3)
    assert (by[("d2", 0)]["start"], by[("d2", 0)]["chunk_len"]) == (0, 1)

    def tid(tok):
        h = 0
        for ch in tok:
            h = (h * config.SHINGLE_BASE + ord(ch)) % config.HASH_P
        return h

    def chash(toks):
        h = 0
        for t in toks:
            h = (h * config.SHINGLE_BASE + tid(t)) % config.HASH_P
        return h

    assert by[("d1", 0)]["chunk_hash"] == chash(["aa", "bb", "cc"])
    assert by[("d1", 1)]["chunk_hash"] == chash(["cc", "dd", "ee"])
    assert by[("d2", 0)]["chunk_hash"] == chash(["x"])


def test_doc_chunks_cover_every_token(spark):
    rows = [(f"d{i}", ["t"] * n) for i, n in enumerate([1, 7, 8, 9, 24, 25, 40])]
    out = packing.doc_chunks(_docs_tokens(spark, rows), w=8, stride=6).collect()
    for doc_id, toks in rows:
        chunks = sorted(
            (r["start"], r["chunk_len"]) for r in out if r["doc_id"] == doc_id
        )
        assert chunks[0][0] == 0
        assert chunks[-1][0] + chunks[-1][1] == len(toks)  # reaches the end
        for (s0, l0), (s1, _) in zip(chunks, chunks[1:]):
            assert s1 <= s0 + l0  # no gap
            assert s1 == s0 + 6  # stride


def test_quality_buckets_shape(spark):
    docs = spark.createDataFrame(
        [
            (i, " ".join((["the"] * 5 if i % 2 else []) + [f"rare{i}w{j}" for j in range(4)]))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    out = textstats.quality_buckets(docs, n_buckets=4).collect()
    assert len(out) == 20
    assert all(0 <= r["bucket"] < 4 for r in out)
    # monotone: higher decibits never gets a lower bucket
    by_bits = sorted(out, key=lambda r: r["decibits"])
    for a, b in zip(by_bits, by_bits[1:]):
        assert a["bucket"] <= b["bucket"]
        if a["decibits"] == b["decibits"]:
            assert a["bucket"] == b["bucket"]  # ties share a bucket
    # both halves of the bimodal corpus actually land in distinct buckets
    assert len({r["bucket"] for r in out}) >= 2


def test_packing_stats_hand_layout(spark):
    # sl: d1=3 d2=6 d3=2 -> offsets 0,3,9; block=4:
    # d1 spans [0,3) -> 1 block; d2 [3,9) -> blocks 0..2 = 3; d3 [9,11) -> 1
    d = _docs_tokens(
        spark,
        [("d1", ["a", "b"]), ("d2", ["c", "d", "e", "f", "g"]), ("d3", ["h"])],
    )
    out = {
        r["n_blocks_spanned"]: r["n_docs"]
        for r in packing.packing_stats(d, block=4).collect()
    }
    assert out == {1: 2, 3: 1}
