#!/usr/bin/env bash
# Build the --py-files zip for spark-submit deployment.
#   scripts/build_pyfiles.sh [out.zip]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist/sems_event_deduplication_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
python - "$OUT" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("sems_event_deduplication_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
