"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB twin for each SQL-expressible one
(generated from the same constants — glirel_spark/oracle.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glirel_spark import config  # noqa: E402
from glirel_spark import oracle  # noqa: E402
from glirel_spark import oracle_corpus as oc  # noqa: E402
from glirel_spark.plans import pipeline, relational  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> (subj, pred, obj) triples at sf0.001."""
    return pipeline.triples(spark, "/root/testdata/sf0.001")


def _api_triples(spark: SparkSession, sf: str) -> DataFrame:
    from glirel_spark.plans import api

    return api.extract_triples(pipeline.docs_tokens(spark, sf))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import pyspark.sql.functions as F

    return {
        # M0/M1 relational core
        "doc_tokens": lambda spark, sf: (
            pipeline.docs_tokens(spark, sf)
            .select(
                "doc_id",
                F.size("tokens").cast("long").alias("n_tokens"),
                F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
            )
        ),
        "mentions": pipeline.mentions,
        "pairs": pipeline.pairs,
        "scored": lambda spark, sf: pipeline.scored(spark, sf).select(
            "doc_id", "head_m_id", "tail_m_id", "h_start", "h_end",
            "t_start", "t_end", "label", "raw", "prob",
        ),
        "triples": pipeline.triples,
        # tensor plane: GLiREL-architecture scorer via mapInPandas
        # (weights are a seeded numpy test double; value-checked against
        # the committed golden table, tools/gen_golden.py)
        "triples_neural": pipeline.triples_neural,
        # production per-doc API (spacy_integration.py:94-119 mirror) —
        # same result relation as `triples`, exercised through
        # plans/api.extract_triples so the public surface is oracle-checked
        "api_triples": _api_triples,
        # coref clustering (union-find / connected components)
        "coref_clusters": pipeline.mention_clusters,
        "cluster_relations": pipeline.cluster_relations,
        # evaluation replay
        "eval_counts": pipeline.eval_counts,
        "eval_metrics": pipeline.eval_metrics,
        "threshold_search": pipeline.threshold_search,
        # reference zero-shot eval protocol on the committed
        # WikiZSL-shaped JSONL fixture (labels from the file itself,
        # eval.py:236-263) — the refeval path hash-gated, not only
        # pytest-gated
        "refeval_counts": pipeline.refeval_counts,
        "refeval_metrics": pipeline.refeval_metrics,
        # linking + graph materialization
        "linked_triples": pipeline.linked_triples,
        # blocked MinHash-LSH fuzzy alias candidates (north_star linking)
        "link_candidates": pipeline.link_candidates,
        # exact + fuzzy-fallback canonicalized triples (full linking path)
        "linked_triples_fuzzy": pipeline.linked_triples_fuzzy,
        "graph": pipeline.graph,
        # incremental upsert == full rebuild (oracle is the rebuild)
        "graph_upsert": pipeline.graph_upsert,
        # KG degree centrality (hub entities) over the materialized graph
        "entity_degrees": pipeline.entity_degrees,
        # 2-hop traversal join (the multi-hop query template)
        "two_hop_paths": pipeline.two_hop_paths,
        # KG entity resolution: neighborhood-Jaccard duplicate candidates
        "entity_neighbor_sim": pipeline.entity_neighbor_sim,
        # KG schema induction: AMIE-style same-pair predicate rules
        "pred_cooccurrence": pipeline.pred_cooccurrence,
        # inverse/symmetric predicate rules p1(x,y) => p2(y,x)
        "pred_inverse": pipeline.pred_inverse,
        # cross-doc entity co-occurrence lift (PMI ratio, log-free)
        "entity_pmi": pipeline.entity_pmi,
        # per-predicate (inverse-)functionality — AMIE PCA ingredient
        "pred_functionality": pipeline.pred_functionality,
        # relation type signatures: pred -> (subj_type, obj_type) shares
        "pred_type_signature": pipeline.pred_type_signature,
        # directed 3-cycles (canonical rotation, pred-agnostic)
        "kg_triangles": pipeline.kg_triangles,
        # weakly connected components (min-label propagation fixpoint)
        "kg_components": pipeline.kg_components,
        # k-core backbone (iterative degree peel, k=2)
        "kg_kcore": pipeline.kg_kcore,
        # scaled-integer PageRank (bit-exact across engines)
        "kg_pagerank": pipeline.kg_pagerank,
        # knowledge fusion: per-(subj,pred) winning object by support
        "kg_fusion": pipeline.kg_fusion,
        # SPO adjacency-list materialization (serving index layout)
        "kg_adjacency": pipeline.kg_adjacency,
        # deterministic filtered negative sampling (KG-embedding protocol)
        "kg_negative_samples": pipeline.kg_negative_samples,
        # common-neighbor link-prediction candidates (top-100)
        "kg_link_pred": pipeline.kg_link_pred,
        # forward-chaining rule application (inverse-rule completion)
        "kg_inferred_triples": pipeline.kg_inferred_triples,
        # per-triple provenance postings (lineage at triple granularity)
        "kg_evidence": pipeline.kg_evidence,
        # per-predicate top-k subject hubs (salting feed)
        "pred_top_entities": pipeline.pred_top_entities,
        # RDF N-Triples export lines
        "kg_ntriples": pipeline.kg_ntriples,
        # meta-path census: length-2 predicate path frequencies
        "pred_path_cooccurrence": pipeline.pred_path_cooccurrence,
        # language-ID confusion matrix vs the corpus's own labels
        "lang_confusion": pipeline.lang_confusion,
        # mergeable HLL distinct-token sketch per lang (bit-exact)
        "distinct_hll": pipeline.distinct_hll,
        # count-min sketch + point-query audit on true top tokens
        "cms_topk": pipeline.cms_topk,
        # frontier BFS hop distances from the min entity
        "kg_bfs": pipeline.kg_bfs,
        # degree histogram (skew census for salting decisions)
        "kg_degree_dist": pipeline.kg_degree_dist,
        # deterministic DeepWalk rollouts (precomputed successor joins)
        "kg_walks": pipeline.kg_walks,
        # distant supervision: KB x co-occurrence silver examples
        "kg_distant_supervision": pipeline.kg_distant_supervision,
        # skip-gram (center, context) counts from the walks (SGNS feed)
        "kg_skipgram_pairs": pipeline.kg_skipgram_pairs,
        # semi-naive transitive closure of the hierarchy predicate
        "kg_closure": pipeline.kg_closure,
        # fixed-round synchronous label-propagation communities
        "kg_label_prop": pipeline.kg_label_prop,
        # per-component bipartiteness / odd-cycle audit (parity BFS)
        "kg_bipartite_audit": pipeline.kg_bipartite_audit,
        # snapshot-to-snapshot changelog (added/removed/changed support)
        "kg_snapshot_diff": pipeline.kg_snapshot_diff,
        # one-row graph dashboard (size / reciprocity / density)
        "kg_summary": pipeline.kg_summary,
        # k-truss backbone (triangle-supported edges only)
        "kg_ktruss": pipeline.kg_ktruss,
        # per-doc canonical-entity salience features
        "entity_salience": pipeline.entity_salience,
        # per-entity NER-type vote profile
        "entity_types": pipeline.entity_types,
        # corpus dedup (training-data pipeline)
        "minhash_signatures": pipeline.minhash_signatures,
        "minhash_neardups": pipeline.minhash_neardups,
        # near-dup FAMILY resolution: connected components over verified
        # near-dup pairs -> canonical doc per family (keep/drop decision)
        "dedup_clusters": pipeline.dedup_clusters,
        # LSH-collision pairs verifying to LOW overlap (contrastive mining)
        "minhash_hard_negatives": pipeline.minhash_hard_negatives,
        # EXACT set-similarity join via prefix filtering (no-LSH complement)
        "allpairs_neardups": pipeline.allpairs_neardups,
        # DIRECTIONAL containment join (quote/excerpt detection)
        "containment_pairs": pipeline.containment_pairs,
        # leakage-safe content-hash splits + cross-split near-dup audit
        "split_assign": pipeline.split_assign,
        "split_leakage": pipeline.split_leakage,
        # family-level re-assignment: zero cross-split leakage by construction
        "split_assign_safe": pipeline.split_assign_safe,
        # sorted-neighborhood ER census (distributed rank + band join)
        "er_sorted_neighborhood": pipeline.er_sorted_neighborhood,
        # benchmark decontamination (shingle overlap vs the eval split)
        "decontaminate": pipeline.decontaminate,
        # Bloom-filter decontamination with false-positive audit
        "bloom_decontaminate": pipeline.bloom_decontaminate,
        "simhash": pipeline.simhash_signatures,
        "simhash_neardups": pipeline.simhash_neardups,
        "fingerprints": pipeline.fingerprints,
        "exact_dedup": pipeline.exact_dedup,
        # text analysis
        "doc_quality": pipeline.doc_quality,
        # within-doc repetition signal (duplicate-shingle fraction)
        "doc_repetition": pipeline.doc_repetition,
        "token_counts": pipeline.token_counts,
        # Gopher-style quality rule panel (integer cross-multiplied rules)
        "doc_gopher_rules": pipeline.doc_gopher_rules,
        # CCNet-style unigram surprisal quality proxy (integer bitlen)
        "doc_surprisal": pipeline.doc_surprisal,
        # bigram-conditional surprisal (one LM order up)
        "doc_bigram_surprisal": pipeline.doc_bigram_surprisal,
        # chunk-level (line-dedup analog) dedup accounting
        "chunk_dedup": pipeline.chunk_dedup,
        # DSIR hashed-bigram importance-resampling weights
        "dsir_weights": pipeline.dsir_weights,
        # ExactSubstr-style cross-doc duplicated-substring runs
        "dup_spans": pipeline.dup_spans,
        # TF-IDF keyword extraction (log-free score: bit-exact ranking)
        "doc_top_terms": pipeline.doc_top_terms,
        "lang_id": pipeline.lang_id,
        # end-to-end keep/drop routing verdict (lang+quality+dedup cascade)
        "corpus_routing": pipeline.corpus_routing,
        # ROLLUP accounting over the routing verdicts
        "routing_stats": pipeline.routing_stats,
        # blocked Levenshtein entity-resolution candidate pairs
        "er_edit_pairs": pipeline.er_edit_pairs,
        # ER surface-form clusters (CC over edit pairs, canonical = min)
        "er_clusters": pipeline.er_clusters,
        # dictionary-free KG canonicalization over the ER clusters
        "kg_canonicalized": pipeline.kg_canonicalized,
        # sharded inverted-index build (posting lists + df/tf)
        "inverted_index": pipeline.inverted_index,
        # BM25 more-like-this retrieval (integer-exact Okapi, two-phase top-k)
        "bm25_topk": pipeline.bm25_topk,
        # BPE tokenizer training over the word-frequency relation
        "bpe_merges": pipeline.bpe_merges,
        # training-mixture planner (largest-remainder token apportionment)
        "corpus_mixture": pipeline.corpus_mixture,
        # trained tokenizer applied: per-doc exact subword counts
        "bpe_token_counts": pipeline.bpe_token_counts,
        # bigram LM count table with exact MLE conditionals
        "ngram_lm": pipeline.ngram_lm,
        # deterministic hash-based stratified downsampling per language
        "corpus_sample": pipeline.corpus_sample,
        # one-pass ROLLUP corpus accounting (per lang x source + totals)
        "corpus_stats": pipeline.corpus_stats,
        # GPT-style sequence packing (distributed prefix-sum layout)
        "token_blocks": pipeline.token_blocks,
        # RAG-style overlapping chunk windows with content hash
        "doc_chunks": pipeline.doc_chunks,
        # CCNet-style exact quality deciles (histogram, no global sort)
        "quality_buckets": pipeline.quality_buckets,
        # packing-efficiency census (docs per block-span count)
        "packing_stats": pipeline.packing_stats,
        # tokenizer vocabulary-budget coverage curve
        "vocab_coverage": pipeline.vocab_coverage,
        # similarity search
        "ann_topk": pipeline.ann_topk,
        "ann_topk_ivf": pipeline.ann_topk_ivf,
        # trained coarse quantizer (sample-fit k-means) + multi-probe —
        # the genuine 10^12-row IVF shape (operators/kmeans.py)
        "ann_topk_kmeans": pipeline.ann_topk_kmeans,
        # product-quantization ADC scan (compressed-domain top-k)
        "ann_topk_pq": pipeline.ann_topk_pq,
        # ADC shortlist -> exact re-rank (the production PQ pattern)
        "ann_topk_pq_rerank": pipeline.ann_topk_pq_rerank,
        # the full FAISS-style index: cell probe + ADC + exact re-rank
        "ann_topk_ivfpq": pipeline.ann_topk_ivfpq,
        # corpus-side multi-assignment variant (top-A cells per vector:
        # A x index size for boundary-vector recall)
        "ann_topk_kmeans_multi": pipeline.ann_topk_kmeans_multi,
        "embedding_neardups": pipeline.embedding_neardups,
        # SemDeDup: trained-cell-blocked semantic near-dup pruning
        "semantic_dedup": pipeline.semantic_dedup,
        # multimodal plumbing
        "media_features": pipeline.media_features,
        # interleave accounting over the input-hint spans schema
        "media_stats": pipeline.media_stats,
        # events windowing / sessionization
        "events_windowed": pipeline.events_windowed,
        "events_sessionized": pipeline.events_sessionized,
        # as-of join (union + carry-forward window: zero joins, one shuffle)
        "events_asof": pipeline.events_asof,
        # range join via time-bucketing (non-equi -> co-partitioned equi-join)
        "events_range_join": pipeline.events_range_join,
        # JSON props extraction as codegen scan expression (no UDF)
        "events_props": pipeline.events_props,
        # ordered conversion funnel (co-partitioned per-step min chain)
        "funnel_counts": pipeline.funnel_counts,
        # SCD2 state intervals (per-key lead, sentinel close)
        "user_state_intervals": pipeline.user_state_intervals,
        # cohort retention matrix (integer epoch weeks, no windows)
        "user_retention": pipeline.user_retention,
        # per-user inter-arrival gap census (session-gap tuning feed)
        "event_gaps": pipeline.event_gaps,
        # general relational/OLAP surface (TPC-H shapes)
        "tpch_pricing_summary": relational.pricing_summary,
        "tpch_top_orders": relational.top_orders,
        "tpch_nation_activity": relational.nation_activity,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_tokens": oracle.q_doc_tokens(),
        "mentions": oracle.q_mentions(),
        "pairs": oracle.q_pairs(),
        "scored": oracle.q_scored(),
        "triples": oracle.q_triples(),
        # golden-table oracle: precomputed outside Spark by
        # tools/gen_golden.py from the deterministic scorer double
        "triples_neural": oracle.q_triples_neural(),
        "api_triples": oracle.q_triples(),
        "coref_clusters": oracle.q_coref_clusters(),
        "cluster_relations": oracle.q_cluster_relations(),
        "eval_counts": oracle.q_eval_counts(),
        "eval_metrics": oracle.q_eval_metrics(),
        "threshold_search": oracle.q_threshold_search(),
        # counts = committed outside-Spark protocol replay; metrics =
        # SQL recomputation of A1-A3 from those counts (oracle.py)
        "refeval_counts": oracle.q_refeval_counts(),
        "refeval_metrics": oracle.q_refeval_metrics(),
        "linked_triples": oracle.q_linked_triples(),
        "link_candidates": oc.q_link_candidates(),
        "linked_triples_fuzzy": oc.q_linked_triples_fuzzy(),
        "graph": oracle.q_graph(),
        "graph_upsert": oracle.q_graph(),
        "entity_degrees": oracle.q_entity_degrees(),
        "two_hop_paths": oracle.q_two_hop_paths(),
        "entity_neighbor_sim": oracle.q_entity_neighbor_sim(),
        "pred_cooccurrence": oracle.q_pred_cooccurrence(),
        "pred_inverse": oracle.q_pred_inverse(),
        "entity_pmi": oracle.q_entity_pmi(),
        "pred_functionality": oracle.q_pred_functionality(),
        "pred_type_signature": oracle.q_pred_type_signature(),
        "kg_fusion": oracle.q_kg_fusion(),
        "kg_adjacency": oracle.q_kg_adjacency(),
        "kg_negative_samples": oracle.q_kg_negative_samples(),
        "kg_link_pred": oracle.q_kg_link_pred(),
        "kg_inferred_triples": oracle.q_kg_inferred_triples(),
        "kg_evidence": oracle.q_kg_evidence(),
        "pred_top_entities": oracle.q_pred_top_entities(),
        "kg_ntriples": oracle.q_kg_ntriples(),
        "pred_path_cooccurrence": oracle.q_pred_path_cooccurrence(),
        "lang_confusion": oc.q_lang_confusion(),
        "distinct_hll": oc.q_distinct_hll(),
        "cms_topk": oc.q_cms_topk(),
        "routing_stats": oc.q_routing_stats(),
        "kg_bfs": oracle.q_kg_bfs(),
        "kg_degree_dist": oracle.q_kg_degree_dist(),
        "kg_walks": oracle.q_kg_walks(),
        "kg_distant_supervision": oracle.q_kg_distant_supervision(),
        "kg_skipgram_pairs": oracle.q_kg_skipgram_pairs(),
        "kg_closure": oracle.q_kg_closure(),
        "kg_label_prop": oracle.q_kg_label_prop(),
        "kg_bipartite_audit": oracle.q_kg_bipartite_audit(),
        "kg_snapshot_diff": oracle.q_kg_snapshot_diff(),
        "kg_summary": oracle.q_kg_summary(),
        "kg_ktruss": oracle.q_kg_ktruss(),
        "entity_salience": oracle.q_entity_salience(),
        "entity_types": oracle.q_entity_types(),
        "doc_bigram_surprisal": oc.q_doc_bigram_surprisal(),
        "kg_triangles": oracle.q_kg_triangles(),
        # recursive-CTE closure / unrolled peel / unrolled integer power iteration
        "kg_components": oracle.q_kg_components(),
        "kg_kcore": oracle.q_kg_kcore(),
        "kg_pagerank": oracle.q_kg_pagerank(),
        "minhash_signatures": oc.q_minhash_signatures(),
        "minhash_neardups": oc.q_minhash_neardups(),
        # recursive-CTE transitive closure (min reachable doc_id)
        "dedup_clusters": oc.q_dedup_clusters(),
        "minhash_hard_negatives": oc.q_minhash_hard_negatives(),
        "allpairs_neardups": oc.q_allpairs_neardups(),
        "containment_pairs": oc.q_containment_pairs(),
        "split_assign": oc.q_split_assign(),
        "split_leakage": oc.q_split_leakage(),
        "split_assign_safe": oc.q_split_assign_safe(),
        "er_sorted_neighborhood": oracle.q_er_sorted_neighborhood(),
        "decontaminate": oc.q_decontaminate(),
        "bloom_decontaminate": oc.q_bloom_decontaminate(),
        "simhash": oc.q_simhash(),
        "simhash_neardups": oc.q_simhash_neardups(),
        "fingerprints": oc.q_fingerprint(),
        "exact_dedup": oc.q_exact_dedup(),
        "doc_quality": oc.q_doc_quality(),
        "doc_repetition": oc.q_doc_repetition(),
        "token_counts": oc.q_token_counts(),
        "doc_gopher_rules": oc.q_doc_gopher_rules(),
        "doc_surprisal": oc.q_doc_surprisal(),
        "chunk_dedup": oc.q_chunk_dedup(),
        "dsir_weights": oc.q_dsir_weights(),
        "dup_spans": oc.q_dup_spans(),
        "doc_top_terms": oc.q_doc_top_terms(),
        "lang_id": oc.q_lang_id(),
        "corpus_routing": oc.q_corpus_routing(),
        "er_edit_pairs": oracle.q_er_edit_pairs(),
        "er_clusters": oracle.q_er_clusters(),
        "kg_canonicalized": oracle.q_kg_canonicalized(),
        "inverted_index": oc.q_inverted_index(),
        "bm25_topk": oc.q_bm25_topk(),
        # golden-table oracle: committed pure-python BPE replay
        # (tools/gen_bpe_golden.py), sig-dispatched like triples_neural
        "bpe_merges": oc.q_bpe_merges(),
        "corpus_mixture": oc.q_corpus_mixture(),
        "bpe_token_counts": oc.q_bpe_token_counts(),
        "ngram_lm": oc.q_ngram_lm(),
        "corpus_sample": oc.q_corpus_sample(),
        "corpus_stats": oc.q_corpus_stats(),
        "token_blocks": oc.q_token_blocks(),
        "doc_chunks": oc.q_doc_chunks(),
        "quality_buckets": oc.q_quality_buckets(),
        "packing_stats": oc.q_packing_stats(),
        "vocab_coverage": oc.q_vocab_coverage(),
        "ann_topk": oc.q_ann_topk(),
        "ann_topk_ivf": oc.q_ann_topk_ivf(),
        "ann_topk_kmeans": oc.q_ann_topk_kmeans(),
        "ann_topk_pq": oc.q_ann_topk_pq(),
        "ann_topk_pq_rerank": oc.q_ann_topk_pq_rerank(),
        "ann_topk_ivfpq": oc.q_ann_topk_ivfpq(),
        "ann_topk_kmeans_multi": oc.q_ann_topk_kmeans(
            corpus_probe=config.IVF_KM_CORPUS_PROBE
        ),
        "embedding_neardups": oc.q_embedding_neardups(),
        "semantic_dedup": oc.q_semantic_dedup(),
        "media_features": oc.q_media_features(),
        "media_stats": oc.q_media_stats(),
        "events_windowed": oc.q_events_windowed(),
        "events_sessionized": oc.q_events_sessionized(),
        "events_asof": oc.q_events_asof(),
        "funnel_counts": oc.q_funnel_counts(),
        "user_state_intervals": oc.q_user_state_intervals(),
        "user_retention": oc.q_user_retention(),
        "event_gaps": oc.q_event_gaps(),
        "events_range_join": oc.q_events_range_join(),
        "events_props": oc.q_events_props(),
        **relational.ORACLE,
    }
