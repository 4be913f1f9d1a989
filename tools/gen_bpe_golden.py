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


def train(words: Counter, rounds: int) -> list[tuple]:
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
    return out


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
        rows = train(words, BPE_ROUNDS)
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


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"])
