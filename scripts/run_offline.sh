#!/bin/bash
# Single-host offline training (the reference's run_offline.sh analogue).
# Usage: ./run_offline.sh <MODEL> <DATA> [extra args...]
MODEL=${1:-TGN}
DATA=${2:-SYNTHETIC}
shift 2 2>/dev/null
cd "$(dirname "$0")/.."
exec python scripts/offline_edge_prediction.py \
  --model "$MODEL" --data "$DATA" "$@"
