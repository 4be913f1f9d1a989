"""spark-submit launch-path regressions: the submitted --master must
win (get_spark silently overrode it until the PYSPARK_GATEWAY_PORT
check), and the --py-files artifact must build deterministically."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_submitted_master_is_respected(tmp_path):
    script = tmp_path / "master_check.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "from glirel_spark.session import get_spark\n"
        "s = get_spark('master-check', cores=2)\n"
        "print('MASTER:', s.sparkContext.master)\n"
        "s.stop()\n"
    )
    out = subprocess.run(
        ["spark-submit", "--master", "local-cluster[2,2,2048]", str(script)],
        capture_output=True, text=True, timeout=240,
    )
    assert "MASTER: local-cluster[2,2,2048]" in out.stdout, out.stderr[-2000:]


def test_dist_zip_is_deterministic_and_importable(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import make_dist

    a = make_dist.build(tmp_path / "a.zip")
    b = make_dist.build(tmp_path / "b.zip")
    assert a.read_bytes() == b.read_bytes()
    probe = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {str(a)!r}); "
         "import glirel_spark.config as c; print(len(c.TABLES))"],
        capture_output=True, text=True, timeout=60,
    )
    assert probe.stdout.strip() == "10", probe.stderr


def test_export_weights_fails_cleanly_without_torch(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import export_weights

    try:
        import torch  # noqa: F401
        pytest.skip("torch present; export path is live")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="torch is not available"):
        export_weights.export("nonexistent.bin", str(tmp_path / "w.npz"))


def test_run_refeval_job_end_to_end(tmp_path):
    """The refeval CLI: spark-submit shape, real fixture in, counts
    parquet + metrics JSON out, one JSON line on stdout."""
    import json

    repo = Path(__file__).resolve().parents[1]
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, str(repo / "jobs/run_refeval.py"),
         "--input", str(repo / "fixtures/wikizsl_dev.jsonl"),
         "--output", str(out), "--cores", "4"],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    row = json.loads(line)
    assert set(row) == {
        "micro_precision", "micro_recall", "micro_f1",
        "macro_precision", "macro_recall", "macro_f1",
    }
    assert (out / "refeval_metrics.json").exists()
    import pandas as pd

    counts = pd.read_parquet(out / "refeval_counts.parquet")
    golden = pd.read_parquet(repo / "goldens/refeval_counts.parquet")
    key = ["label", "tp", "pred_n", "true_n"]
    assert (
        counts[key].sort_values("label").reset_index(drop=True)
        .equals(golden[key].sort_values("label").reset_index(drop=True))
    )
