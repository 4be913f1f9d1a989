"""ER surface-form clustering + dictionary-free KG canonicalization
(linking.er_clusters / linking.canonicalized_graph)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark.operators import linking


def _mentions(spark, names):
    return spark.createDataFrame(
        [(str(i), n) for i, n in enumerate(names)], "doc_id string, text string"
    )


def test_transitive_chain_collapses(spark):
    # abcd ~ abcde ~ abcdef (dist 1 each); abcd vs abcdef is dist 2
    # (still an edge at max_dist=2), and zzzz is a singleton.
    m = _mentions(spark, ["abcd", "abcde", "abcdef", "zzzz"])
    out = linking.er_clusters(m).collect()
    by_name = {r["name"]: r for r in out}
    assert by_name["abcd"]["canonical"] == "abcd"
    assert by_name["abcde"]["canonical"] == "abcd"
    assert by_name["abcdef"]["canonical"] == "abcd"
    assert by_name["abcd"]["cluster_size"] == 3
    assert by_name["zzzz"]["canonical"] == "zzzz"
    assert by_name["zzzz"]["cluster_size"] == 1


def test_chain_beyond_pairwise_radius(spark):
    # aaaa -1- aaab -1- aabb -1- abbb: endpoints are dist 3 apart (no
    # direct edge at max_dist=2) but transitivity must still merge all.
    m = _mentions(spark, ["aaaa", "aaab", "aabb", "abbb"])
    out = linking.er_clusters(m).collect()
    assert {r["canonical"] for r in out} == {"aaaa"}
    assert all(r["cluster_size"] == 4 for r in out)


def test_mapping_is_total_and_canonical_is_member(spark):
    names = ["alpha", "alphb", "beta", "betaz", "gamma"]
    m = _mentions(spark, names)
    out = linking.er_clusters(m)
    assert out.count() == len(names)
    # canonical is always the min member of its cluster
    bad = (
        out.groupBy("canonical")
        .agg(F.min("name").alias("mn"))
        .filter(F.col("canonical") != F.col("mn"))
    )
    assert bad.count() == 0


def test_canonicalized_graph_merges_surfaces(spark):
    triples = spark.createDataFrame(
        [
            ("1", "Acme Corp", "works_for", "Alice"),
            ("2", "Acme Corpx", "works_for", "Alice"),
            ("3", "Acme Corp", "works_for", "Alicf"),
        ],
        "doc_id string, head_text string, label string, tail_text string",
    )
    ments = _mentions(
        spark, ["acme corp", "acme corpx", "alice", "alicf"]
    )
    er = linking.er_clusters(ments)
    g = linking.canonicalized_graph(triples, er).collect()
    assert len(g) == 1
    row = g[0]
    assert row["subj"] == "acme corp"
    assert row["obj"] == "alice"
    assert row["n_mentions"] == 3
    assert row["n_docs"] == 3
    assert row["n_subj_surfaces"] == 2
    assert row["n_obj_surfaces"] == 2
