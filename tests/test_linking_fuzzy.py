"""Fuzzy alias candidates: blocked char-3-gram MinHash-LSH between
mention surfaces and the alias dictionary, verified against an
independent pure-Python replication of the full chain (shingles ->
signatures -> bands -> exact Jaccard)."""

from __future__ import annotations

from glirel_spark import config
from glirel_spark.operators.linking import fuzzy_alias_candidates


def _shingles(s: str) -> set[int]:
    b, p = config.SHINGLE_BASE, config.HASH_P
    chars = [ord(ch) % p for ch in s]
    return {
        ((chars[i] % p) * b + chars[i + 1]) % p * b + chars[i + 2]
        for i in range(len(chars) - 2)
    } if len(chars) >= 3 else set()


def _bands(sh: set[int]) -> set[tuple[int, int]]:
    b, p = config.SHINGLE_BASE, config.HASH_P
    mh = [min((x * a + bb) % p for x in sh) for a, bb in config.MINHASH_AB]
    r = config.MINHASH_K // config.MINHASH_BANDS
    out = set()
    for band in range(config.MINHASH_BANDS):
        key = 0
        for j in range(r):
            key = (key * b + mh[band * r + j]) % p
        out.add((band, key))
    return out


def _expected(surfaces, aliases, threshold):
    exp = {}
    for s in surfaces:
        for a, cid in aliases.items():
            if s == a:
                continue
            ss, aa = _shingles(s), _shingles(a.lower())
            if not ss or not aa or not (_bands(ss) & _bands(aa)):
                continue
            inter = len(ss & aa)
            un = len(ss | aa)
            j = inter / un
            if j >= threshold:
                exp[(s, a.lower())] = (cid, inter, un)
    return exp


def test_fuzzy_candidates_match_python_replication(spark):
    aliases = {
        "apache spark": "Q:spark",
        "merge join": "Q:merge_join",
        "broadcast": "Q:broadcast",
    }
    texts = [
        "apache sparks",   # near-dup of an alias
        "merge joins",     # inflection
        "merge join",      # exact (excluded: surface == alias)
        "vectorized scan", # unrelated
        "br",              # < 3 chars: no shingles, exact-path only
    ]
    mentions = spark.createDataFrame(
        [(f"d{i}", 0, 0, 0, "T", t) for i, t in enumerate(texts)],
        "doc_id string, m_id int, start int, end int, type string, text string",
    )
    adf = spark.createDataFrame(
        sorted(aliases.items()), "alias string, canonical_id string"
    )
    got = {
        (r.surface, r.alias): (r.canonical_id, r.inter, r.un)
        for r in fuzzy_alias_candidates(mentions, adf, threshold=0.3).collect()
    }
    exp = _expected([t.lower() for t in texts], aliases, 0.3)
    assert got == exp
    # the two inflected surfaces must actually be found
    assert ("apache sparks", "apache spark") in got
    assert ("merge joins", "merge join") in got


def test_apply_fuzzy_second_chance(spark):
    from glirel_spark.operators.linking import apply_fuzzy, best_fuzzy_alias

    linked = spark.createDataFrame(
        [
            ("d1", "Q1", "uses", "Q:surface:tble scan", 0.9),
            ("d2", "Q:surface:unknown thing", "uses", "Q2", 0.8),
        ],
        "doc_id string, subj string, pred string, obj string, prob double",
    )
    cands = spark.createDataFrame(
        [
            ("tble scan", "table scan", "Q7", 3, 9, 3 / 9),
            ("tble scan", "table", "Q8", 2, 8, 2 / 8),
        ],
        "surface string, alias string, canonical_id string, "
        "inter long, un long, jaccard double",
    )
    out = {
        (r.doc_id): (r.subj, r.obj)
        for r in apply_fuzzy(linked, best_fuzzy_alias(cands)).collect()
    }
    assert out["d1"] == ("Q1", "Q7")  # best-jaccard candidate substituted
    assert out["d2"] == ("Q:surface:unknown thing", "Q2")  # no candidate -> unchanged
