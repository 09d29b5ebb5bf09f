#!/usr/bin/env bash
# spark-submit deployment of the KG pipeline (north rule: submitted via
# spark-submit --py-files). Builds the package zip, then submits the
# pipeline entry with it.
#
# Usage:
#   scripts/submit_pipeline.sh <documents.parquet> <out_dir> [master] [extra spark confs...]
# Example:
#   scripts/submit_pipeline.sh /root/testdata/sf0.01/documents.parquet /tmp/kg_out 'local[8]'
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
DOCS="${1:?documents parquet path}"
OUT="${2:?output dir}"
MASTER="${3:-local[8]}"
shift $(( $# > 3 ? 3 : $# ))

PYZIP="$(python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from morph_xr2rml_spark.plans.session import package_zip
print(package_zip())
EOF
)"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$PYZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=32 \
  "$@" \
  "$REPO/scripts/pipeline_main.py" \
  --documents "$DOCS" --out "$OUT"
