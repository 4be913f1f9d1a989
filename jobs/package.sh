#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule launch shape).
#
#   ./jobs/package.sh                 # -> dist/glirel_spark.zip
#   spark-submit --master <cluster> \
#     --py-files dist/glirel_spark.zip \
#     jobs/run_pipeline.py --input <table> --output <table>
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/glirel_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("glirel_spark")
with zipfile.ZipFile("dist/glirel_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/glirel_spark.zip")
EOF
