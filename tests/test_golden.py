"""Golden-table guard for the tensor plane.

The committed goldens/<sf>/triples_neural.parquet files are the value
oracle for the neural query (oracle.q_triples_neural). This test
regenerates the sf0.001 expectation from scratch (pure pandas + numpy +
DuckDB — tools/gen_golden.py) and asserts it is IDENTICAL to the
committed file, so any drift in the scorer double, the mention stage, or
the decode semantics breaks loudly here instead of silently staling the
driver gate.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_committed_golden_matches_regeneration():
    from gen_golden import OUT_COLS, expected_triples_neural

    fresh = expected_triples_neural("/root/testdata/sf0.001")
    committed = pd.read_parquet(ROOT / "goldens/sf0.001/triples_neural.parquet")
    key = ["doc_id", "head_start", "head_end", "tail_start", "tail_end", "label"]
    f = fresh.sort_values(key).reset_index(drop=True)
    c = committed.sort_values(key).reset_index(drop=True)
    assert list(f.columns) == OUT_COLS == list(c.columns)
    assert len(f) == len(c)
    for col in OUT_COLS:
        if col == "raw":
            assert f[col].isna().all() and c[col].isna().all()
            continue
        # exact equality — prob must match BIT-for-bit (einsum kernel is
        # thread-count independent; `@`/BLAS is not, see scorer._mm)
        assert (f[col].values == c[col].values).all(), col
