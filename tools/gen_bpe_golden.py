"""Golden-table generator for the bpe_merges oracle: an INDEPENDENT
pure-python BPE trainer (Sennrich et al. 2016 reference algorithm —
dict counters, left-to-right non-overlapping merge) run over the same
documents parquet, written to goldens/sf*/bpe_merges.parquet.

Same footing as tools/gen_golden.py for triples_neural: iterative
argmax with loop-carried state is not one SQL query, so the value gate
compares Spark against this committed outside-Spark replay (dispatched
per scale factor by the corpus signature in oracle._GOLDEN_SIGS).

Usage: python tools/gen_bpe_golden.py [sf0.001 sf0.01 sf0.1]
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glirel_spark.operators.textstats import BPE_ROUNDS  # noqa: E402


def train(words: Counter, rounds: int):
    vocab = {w: tuple(w) + ("</w>",) for w in words}
    out = []
    for rnd in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, sym in vocab.items():
            f = words[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        for w, sym in vocab.items():
            ns, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == left and sym[i + 1] == right:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            vocab[w] = tuple(ns)
        out.append((rnd, left, right, merged, cnt))
    return out, vocab


def main(sfs: list[str]) -> None:
    root = Path(__file__).resolve().parent.parent
    for sf in sfs:
        texts = duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall()
        words: Counter = Counter()
        for (t,) in texts:
            for w in t.split(" "):
                if w:
                    words[w] += 1
        rows, vocab = train(words, BPE_ROUNDS)
        dest = root / "goldens" / sf / "bpe_merges.parquet"
        dest.parent.mkdir(parents=True, exist_ok=True)
        con = duckdb.connect()
        con.execute(
            'CREATE TABLE g ("round" INTEGER, "left" VARCHAR,'
            ' "right" VARCHAR, merged VARCHAR, pair_count BIGINT)'
        )
        con.executemany("INSERT INTO g VALUES (?,?,?,?,?)", rows)
        con.execute(f"COPY g TO '{dest}' (FORMAT PARQUET)")
        print(sf, rows)

        # per-doc counts under the trained vocab (standalone '</w>'
        # excluded — same rule as textstats.bpe_token_counts)
        n_sub = {w: sum(1 for s in v if s != "</w>") for w, v in vocab.items()}
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall()
        crows = []
        for doc_id, t in docs:
            ws = [w for w in t.split(" ") if w]
            if not ws:
                continue  # no output row, matching the Spark-side join
            bpe = sum(n_sub[w] for w in ws)
            est = sum((len(w) + 3) // 4 for w in ws)
            crows.append(
                (int(doc_id), len(ws), bpe, est, bpe * 1000 // len(ws))
            )
        con.execute(
            "CREATE TABLE tc (doc_id BIGINT, n_words BIGINT, bpe_tokens"
            " BIGINT, est_tokens BIGINT, fertility_milli BIGINT)"
        )
        con.executemany("INSERT INTO tc VALUES (?,?,?,?,?)", crows)
        con.execute(
            f"COPY tc TO '{root}/goldens/{sf}/bpe_token_counts.parquet'"
            " (FORMAT PARQUET)"
        )
        print(sf, "token_counts rows:", len(crows))


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"])
