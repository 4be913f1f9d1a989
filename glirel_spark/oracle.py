"""DuckDB oracle SQL, generated from the SAME constants as the Spark
operators (glirel_spark/config.py) so the two sides cannot drift.

Each function returns ANSI SQL runnable by DuckDB against the
pre-registered parquet views (region nation customer supplier part
orders lineitem events documents embeddings). The driver executes these
side-by-side with ``__spark_entry__.queries()`` and compares row count,
schema, and an order-insensitive value hash.

The scorer and all hash/sketch arithmetic are pure integer math with at
most one exactly-rounded IEEE division, so float values are
bit-identical across engines.
"""

from __future__ import annotations

from glirel_spark import config as c


def _gaz_values() -> str:
    rows = [f"('{t}', 1, '{ty}')" for t, ty in sorted(c.ENTITY_UNIGRAMS.items())]
    rows += [f"('{a} {b}', 2, '{ty}')" for (a, b), ty in sorted(c.ENTITY_BIGRAMS.items())]
    return ", ".join(rows)


def _label_values(include_coref: bool = False) -> str:
    def lst(v):
        if v is None:
            return "CAST(NULL AS VARCHAR[])"
        inner = ", ".join(f"'{x}'" for x in v)
        return f"[{inner}]"

    rows = [
        f"('{label}', {lst(cc.get('allowed_head'))}, {lst(cc.get('allowed_tail'))})"
        for label, cc in sorted(c.RELATION_LABELS.items())
    ]
    if include_coref:
        rows.append(f"('{c.COREF_LABEL}', CAST(NULL AS VARCHAR[]), CAST(NULL AS VARCHAR[]))")
    return ", ".join(rows)


# ---------------------------------------------------------------------------
# Shared CTE chain: documents -> tokens -> mentions -> pairs -> scored
# ---------------------------------------------------------------------------

CTE_TOKENS = """
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
)
"""

CTE_MENTIONS = f"""
cand AS (
  SELECT doc_id, pos AS start, token AS surface, 1 AS n_tokens FROM toks
  UNION ALL
  SELECT a.doc_id, a.pos AS start, a.token || ' ' || b.token AS surface, 2 AS n_tokens
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
gaz(surface, n_tokens, type) AS (VALUES {{GAZ}}),
mraw AS (
  SELECT c.doc_id, c.start,
         c.start + c.n_tokens - 1 AS "end",
         g.type, c.surface AS text
  FROM cand c JOIN gaz g ON c.surface = g.surface AND c.n_tokens = g.n_tokens
),
mdedup AS (
  SELECT doc_id, start, "end", type, text FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, start, "end"
                                 ORDER BY type, text) AS _rn
    FROM mraw
  ) WHERE _rn = 1
),
mkept AS (
  SELECT s.* FROM mdedup s
  WHERE length(s.text) <= 50 AND NOT EXISTS (
    SELECT 1 FROM mdedup t
    WHERE t.doc_id = s.doc_id
      AND NOT (s."end" < t.start OR t."end" < s.start)
      AND NOT (s.start = t.start AND s."end" = t."end")
      AND ( (t."end" - t.start) > (s."end" - s.start)
            OR ((t."end" - t.start) = (s."end" - s.start) AND t.start < s.start) )
  )
),
mentions AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start, "end") - 1 AS INT) AS m_id,
         start, "end", type, text
  FROM mkept
)
""".replace("{GAZ}", _gaz_values())

CTE_PAIRS = f"""
pairs AS (
  SELECT h.doc_id,
         h.m_id AS head_m_id, t.m_id AS tail_m_id,
         h.start AS h_start, h."end" AS h_end,
         t.start AS t_start, t."end" AS t_end,
         h.type AS h_type, t.type AS t_type,
         h.text AS h_text, t.text AS t_text,
         abs(h.start - t.start) AS dist,
         (abs(h.start - t.start) <= {c.MAX_PAIR_DISTANCE}) AS is_rel,
         (h.m_id < t.m_id) AS is_coref
  FROM mentions h JOIN mentions t
    ON h.doc_id = t.doc_id AND h.m_id <> t.m_id
  WHERE abs(h.start - t.start) <= {c.MAX_PAIR_DISTANCE} OR h.m_id < t.m_id
)
"""


def _raw_expr(h: str = "h_text", t: str = "t_text", lab: str = "label",
              dist: str = "dist") -> str:
    return (
        f"(({c.SCORE_W_HLEN} * length({h}) + {c.SCORE_W_TLEN} * length({t})"
        f" + {c.SCORE_W_LLEN} * length({lab}) + {c.SCORE_W_DIST} * {dist}"
        f" + {c.SCORE_W_HCH} * ascii({h}) + {c.SCORE_W_TCH} * ascii({t})"
        f" + {c.SCORE_W_LCH} * ascii({lab})) % {c.SCORE_MOD})"
    )


def cte_scored(include_coref: bool = False) -> str:
    raw = _raw_expr()
    coref_raw = (
        f"CASE WHEN label = '{c.COREF_LABEL}' THEN "
        f"(CASE WHEN h_text = t_text THEN {c.SCORE_MOD - 1} ELSE 0 END) "
        f"ELSE {raw} END"
    )
    return f"""
labels(label, allowed_head, allowed_tail) AS (VALUES {_label_values(include_coref)}),
scored AS (
  SELECT p.*, l.label, l.allowed_head, l.allowed_tail,
         CAST({coref_raw} AS INT) AS raw,
         CAST({coref_raw} AS DOUBLE) / {float(c.SCORE_MOD - 1)} AS prob
  FROM pairs p CROSS JOIN labels l
  WHERE p.is_rel
)
"""


def cte_triples(threshold: float = c.THRESHOLD, top_k: int = c.TOP_K,
                constrained: bool = True) -> str:
    constraint = ""
    if constrained:
        constraint = (
            "AND (allowed_head IS NULL OR list_contains(allowed_head, h_type)) "
            "AND (allowed_tail IS NULL OR list_contains(allowed_tail, t_type))"
        )
    return f"""
thresholded AS (
  SELECT *, row_number() OVER (
     PARTITION BY doc_id, h_start, h_end, t_start, t_end
     ORDER BY prob DESC, label ASC) AS _rk
  FROM scored WHERE prob > {threshold}
),
triples AS (
  SELECT doc_id,
         h_start AS head_start, h_end + 1 AS head_end,
         t_start AS tail_start, t_end + 1 AS tail_end,
         h_text AS head_text, t_text AS tail_text,
         label, raw, prob
  FROM thresholded
  WHERE _rk <= {top_k} {constraint}
)
"""


def with_chain(*extra: str) -> str:
    parts = [CTE_TOKENS.strip(), CTE_MENTIONS.strip(), CTE_PAIRS.strip()]
    parts += [e.strip() for e in extra]
    return "WITH " + ",\n".join(p.rstrip().rstrip(",") for p in parts)


# ---------------------------------------------------------------------------
# Per-query oracle SQL
# ---------------------------------------------------------------------------

def q_doc_tokens() -> str:
    return (
        "WITH "
        + CTE_TOKENS.strip()
        + "\nSELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,"
        " CAST(count(DISTINCT token) AS BIGINT) AS n_distinct"
        " FROM toks GROUP BY doc_id"
    )


def q_mentions() -> str:
    return (
        with_chain()
        + '\nSELECT doc_id, m_id, start, "end" AS end, type, text FROM mentions'
    )


def q_pairs() -> str:
    return (
        with_chain()
        + "\nSELECT doc_id, head_m_id, tail_m_id, h_start, h_end, t_start, t_end,"
        " h_type, t_type, h_text, t_text, dist, is_rel, is_coref FROM pairs"
    )


def q_scored() -> str:
    return (
        with_chain(cte_scored())
        + "\nSELECT doc_id, head_m_id, tail_m_id, h_start, h_end, t_start, t_end,"
        " label, raw, prob FROM scored"
    )


def q_triples() -> str:
    return (
        with_chain(cte_scored(), cte_triples())
        + "\nSELECT * FROM triples"
    )
