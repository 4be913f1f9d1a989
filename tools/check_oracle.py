"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin at a
given sf, compare row count, column names, and an order-insensitive
value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            df[col] = s.astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from glirel_spark.session import get_spark

    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name:32s} rows={len(sdf):7d}  (no oracle — rows-only)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = cols_ok and rows_ok and norm_hash(sdf) == norm_hash(odf)
        status = "OK " if (cols_ok and rows_ok and hash_ok) else "FAIL"
        print(
            f"  {name:32s} rows={len(sdf):7d}/{len(odf):7d}"
            f" cols={'=' if cols_ok else sorted(sdf.columns)}"
            f"{'' if cols_ok else ' vs ' + str(sorted(odf.columns))} hash={'=' if hash_ok else 'X'} {status}"
        )
        if status == "FAIL":
            failures.append(name)
            if cols_ok and rows_ok:
                m = sdf.merge(odf, how="outer", indicator=True)
                diff = m[m["_merge"] != "both"]
                print(diff.head(10).to_string())
    spark.stop()
    if failures:
        print("FAILED:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
