"""Build dist/glirel_spark.zip for `spark-submit --py-files`.

Deterministic: files are added in sorted order with zeroed timestamps,
so the archive is byte-stable for a given tree (same property as the
golden tables — rebuilds don't churn).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "glirel_spark.zip"
    out.parent.mkdir(exist_ok=True)
    files = sorted(
        p for p in (REPO / "glirel_spark").rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    print(build())
