"""glirel_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference GLiREL pipeline (jackboyla/GLiREL, read-only at /root/reference).

Architecture (see SURVEY.md):

- **Relational plane** (mention extraction, entity-pair generation,
  threshold/top-k decode, constraint filtering, coref clustering,
  metrics, linking, graph materialization) — native DataFrame/SQL
  operators, Catalyst-optimizable, DuckDB-oracle-checkable.
- **Tensor plane** (GLiREL-style label-prompt × span-pair scoring) — one
  vectorized ``mapInPandas`` boundary with a per-executor model
  singleton (numpy test double of the reference's T1–T13 stages;
  the container has no torch, and the engine is scorer-agnostic).

Nothing in this package is a port of the reference's code; citations in
docstrings are to *semantics* being reproduced (file:line into
/root/reference).
"""

__version__ = "0.1.0"
