#!/bin/sh
# Cluster submission example (north rule: spark-submit --py-files at N and
# 4N executors). Builds the package zip and submits the ingest+join job.
#
#   ./scripts/submit_example.sh spark://master:7077 8
#   ./scripts/submit_example.sh spark://master:7077 32
set -e
MASTER="${1:-local[8]}"
EXECUTORS="${2:-8}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

cd "$REPO"
rm -f /tmp/spatialindex_spark.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile('/tmp/spatialindex_spark.zip', 'w') as z:
    for root, _, files in os.walk('spatialindex_spark'):
        for f in files:
            if f.endswith(('.py', '.c')):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote /tmp/spatialindex_spark.zip')
EOF

exec spark-submit \
  --master "$MASTER" \
  --num-executors "$EXECUTORS" \
  --py-files /tmp/spatialindex_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=262144 \
  bench.py
