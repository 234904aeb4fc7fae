#!/usr/bin/env bash
# Run the full KG construction pipeline as a Ray job (the deployment path
# of the north rule: `ray job submit` onto a fixed-size multi-node
# cluster). In this sandbox there is no multi-node cluster; against a
# real one, point RAY_ADDRESS at the head node's job server.
#
# Usage:
#   ./scripts/submit_job.sh <docs_parquet_dir> <output_dir> [shards] [partitions]
#
# The entrypoint is the package CLI; the working dir ships the package to
# the cluster. Resume: re-submitting with the same output dir skips every
# committed unit (extraction shards + finished tables) via the manifest.
set -euo pipefail

DOCS=${1:?docs parquet dir}
OUT=${2:?output dir}
SHARDS=${3:-64}
PARTS=${4:-256}

exec ray job submit \
  --working-dir "$(dirname "$0")/.." \
  -- python -m medical_doc_knowledge_graph_system_ray.cli ingest \
       --docs "$DOCS" --out "$OUT" --shards "$SHARDS" --partitions "$PARTS"
