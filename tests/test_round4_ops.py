"""Round-4 interleaved-sequence operators: caption mining, media_ref
integrity, media-atomic chunking, and multimodal KG evidence.

Each test cross-checks the operator against an independent python
recomputation from the raw parquet (not against the operator's own
rule constants), so a rule drift on either side fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from glirel_spark.operators import multimodal
from glirel_spark.sources.tables import _CHUNK, _MEDIA_EVERY, interleaved_documents

SF = "/root/testdata/sf0.001/documents.parquet"


def _flat(spark):
    return spark.read.parquet(SF)


def _py_docs():
    rows = duckdb.sql(f"SELECT doc_id, text FROM '{SF}'").fetchall()
    return {did: text.split(" ") for did, text in rows}


def _py_spans(did: int, toks: list[str]):
    """Independent replay of the interleave: list of (kind, text, ref)."""
    import math

    out = []
    n_chunks = math.ceil(len(toks) / _CHUNK)
    for i in range(n_chunks):
        out.append(("text", " ".join(toks[i * _CHUNK:(i + 1) * _CHUNK]), None))
        if (did * 7 + i) % _MEDIA_EVERY == 0:
            out.append(("media", None, f"media://{did}/{i}"))
    return out


def test_caption_pairs_match_python_replay(spark):
    inter = interleaved_documents(_flat(spark))
    got = {
        (r["doc_id"], r["media_ref"]): (r["media_offset"], r["caption"],
                                        r["caption_n_tokens"])
        for r in multimodal.caption_pairs(inter).collect()
    }
    want = {}
    for did, toks in _py_docs().items():
        spans = _py_spans(did, toks)
        for k, (kind, text, ref) in enumerate(spans):
            if kind == "media":
                cap = spans[k - 1][1]
                want[(str(did), ref)] = (k, cap, len(cap.split(" ")))
    assert got == want
    assert len(want) > 0


def test_media_ref_audit_all_green_and_sums(spark):
    inter = interleaved_documents(_flat(spark))
    rows = multimodal.media_ref_audit(inter).collect()
    want_sum = {}
    for did, toks in _py_docs().items():
        meds = [int(ref.rsplit("/", 1)[1])
                for kind, _, ref in _py_spans(did, toks) if kind == "media"]
        want_sum[str(did)] = (len(meds), sum(meds))
    assert len(rows) == len(want_sum)
    for r in rows:
        n, s = want_sum[r["doc_id"]]
        assert r["n_refs"] == r["n_wellformed"] == r["n_doc_match"] == n
        assert r["n_distinct"] == n
        assert r["chunk_sum"] == s


def _py_chunks(did: int, toks: list[str], budget: int, media_cost: int):
    spans = _py_spans(did, toks)
    costs = [media_cost if k == "media" else len(t.split(" "))
             for k, t, _ in spans]
    out = {}
    cum = 0
    for off, (span, cost) in enumerate(zip(spans, costs)):
        cid = cum // budget
        e = out.setdefault(cid, [0, 0, 0, off, off])
        e[0] += 1
        e[1] += span[0] == "media"
        e[2] += cost
        e[4] = off
        cum += cost
    return out


def test_interleaved_chunks_match_python_replay(spark):
    from glirel_spark import config

    inter = interleaved_documents(_flat(spark))
    got = {}
    for r in multimodal.interleaved_chunks(inter).collect():
        got[(r["doc_id"], r["chunk_id"])] = (
            r["n_spans"], r["n_media_spans"], r["n_tokens"],
            r["first_offset"], r["last_offset"],
        )
    want = {}
    for did, toks in _py_docs().items():
        for cid, (ns, nm, nt, fo, lo) in _py_chunks(
            did, toks, config.INTERLEAVED_CHUNK_BUDGET, config.MEDIA_TOKEN_COST
        ).items():
            want[(str(did), cid)] = (ns, nm, nt, fo, lo)
    assert got == want
    # media atomicity: every chunk's token load is bounded by
    # budget + (max span cost - 1); spans were never split
    cap = config.INTERLEAVED_CHUNK_BUDGET + config.MEDIA_TOKEN_COST - 1
    assert all(v[2] <= cap for v in got.values())


def test_interleaved_chunks_oversized_span_skips_no_empty_chunks(spark):
    """When a single span's cost exceeds the budget, floor(cum/budget)
    skips chunk ids; the operator must emit only non-empty chunks (no
    n_spans=0 / NULL-offset placeholder rows) and still match the
    Python replay, which is empty-chunk-free by construction."""
    from glirel_spark import config

    budget = config.INTERLEAVED_CHUNK_BUDGET
    media_cost = 3 * budget  # one media span alone spans 3 budgets
    inter = interleaved_documents(_flat(spark))
    rows = multimodal.interleaved_chunks(
        inter, budget=budget, media_cost=media_cost
    ).collect()
    assert all(r["n_spans"] > 0 for r in rows)
    assert all(
        r["first_offset"] is not None and r["last_offset"] is not None
        for r in rows
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["n_spans"], r["n_media_spans"], r["n_tokens"],
            r["first_offset"], r["last_offset"],
        )
        for r in rows
    }
    want = {}
    for did, toks in _py_docs().items():
        for cid, v in _py_chunks(did, toks, budget, media_cost).items():
            want[(str(did), cid)] = tuple(v)
    assert got == want
    # the skip actually occurred somewhere, so the regression is real
    by_doc: dict[str, list[int]] = {}
    for (did, cid) in got:
        by_doc.setdefault(did, []).append(cid)
    assert any(
        sorted(cids) != list(range(len(cids))) for cids in by_doc.values()
    )


@pytest.fixture(scope="module")
def evidence(spark):
    from glirel_spark.plans import pipeline

    sf = "/root/testdata/sf0.001"
    return multimodal.media_evidence(
        pipeline.triples(spark, sf), pipeline.docs_tokens(spark, sf)
    ).collect()


def test_media_evidence_refs_are_real_spans(spark, evidence):
    """Every emitted media_ref must be an actual media span of that doc
    (checked against the interleaved table itself, not the rule)."""
    inter = interleaved_documents(_flat(spark))
    real = {
        (r["doc_id"], r["s"]["media_ref"])
        for r in inter.select(
            "doc_id", F.explode("spans").alias("s")
        ).filter(F.col("s.kind") == "media").collect()
    }
    n_with_media = 0
    for row in evidence:
        if row["media_ref"] is not None:
            n_with_media += 1
            assert (str(int(row["doc_id"])), row["media_ref"]) in real
    assert n_with_media > 0


def test_media_evidence_is_nearest(evidence):
    """No media chunk of the doc is strictly closer to the head chunk
    than the chosen one (python replay of chunk geometry)."""
    import math

    docs = _py_docs()
    for row in evidence:
        did = int(row["doc_id"])
        toks = docs[did]
        n_chunks = math.ceil(len(toks) / _CHUNK)
        meds = [i for i in range(n_chunks)
                if (did * 7 + i) % _MEDIA_EVERY == 0]
        c = row["head_chunk"]
        if not meds:
            assert row["media_chunk"] is None
            assert row["media_ref"] is None
            continue
        best = min(meds, key=lambda i: (abs(i - c), i))
        assert row["media_chunk"] in meds
        assert abs(row["media_chunk"] - c) == abs(best - c)
        assert row["chunk_distance"] == abs(best - c)


def test_pii_scrub_counts_and_redaction(spark):
    from glirel_spark.operators import textstats

    docs = _flat(spark)
    rows = textstats.pii_scrub(docs).collect()
    assert len(rows) == docs.count()
    for r in rows[:200]:
        did = int(r["doc_id"])
        assert r["n_emails"] == did % 3
        assert r["n_ipv4"] == did % 4
        assert r["n_hosts"] == did % 5
        red = r["redacted"]
        assert red.count("<EMAIL>") == did % 3
        assert red.count("<IP>") == did % 4
        assert red.count("<HOST>") == did % 5
        assert "@" not in red and "host-" not in red


def test_interleaved_blocks_match_python_replay(spark):
    from glirel_spark import config
    from glirel_spark.operators import packing

    B, MC = config.PACK_BLOCK, config.MEDIA_TOKEN_COST
    inter = interleaved_documents(_flat(spark))
    got = {
        r["block_id"]: (r["n_positions"], r["n_docs"], r["n_media_spans"],
                        r["first_doc"], r["last_doc"])
        for r in packing.interleaved_blocks(inter).collect()
    }
    # replay: concatenate per-doc cost streams in doc_id STRING order
    want = {}
    s = 0
    for did_str in sorted(str(d) for d in _py_docs()):
        did = int(did_str)
        spans = _py_spans(did, _py_docs()[did])
        costs = [MC if k == "media" else len(t.split(" "))
                 for k, t, _ in spans]
        cum = 0
        for (kind, _, _), cost in zip(spans, costs):
            if kind == "media":
                bid = (s + cum) // B
                e = want.setdefault(bid, [0, set(), 0])
                e[2] += 1
            cum += cost
        sl = sum(costs) + 1
        for bid in range(s // B, (s + sl - 1) // B + 1):
            e = want.setdefault(bid, [0, set(), 0])
            e[0] += min(s + sl, (bid + 1) * B) - max(s, bid * B)
            e[1].add(did_str)
        s += sl
    assert set(got) == set(want)
    for bid, (npos, docs_in, nmed) in want.items():
        g = got[bid]
        assert g[0] == npos and g[1] == len(docs_in) and g[2] == nmed
        assert g[3] == min(docs_in) and g[4] == max(docs_in)
    # every block full except the last
    last = max(want)
    assert all(got[b][0] == B for b in got if b != last)
