#!/usr/bin/env bash
# Build a FRESH --py-files zip and submit the extraction pipeline.
# The zip is always rebuilt from srag_spark/ so it cannot go stale
# relative to the source tree (it is not version-controlled).
#
#   tools/submit.sh --master local[8] -- \
#       --input /tmp/docs_parquet --output /tmp/extract_out --n-buckets 32
#
# Args before `--` go to spark-submit; args after go to the driver.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
python "$ROOT/tools/make_pyfiles.py"
SUBMIT_ARGS=()
while [[ $# -gt 0 && "$1" != "--" ]]; do SUBMIT_ARGS+=("$1"); shift; done
[[ $# -gt 0 ]] && shift
exec spark-submit "${SUBMIT_ARGS[@]}" \
    --py-files "$ROOT/dist/srag_spark.zip" \
    "$ROOT/tools/submit_extraction.py" "$@"
