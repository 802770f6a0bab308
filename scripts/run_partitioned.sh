#!/bin/bash
# Partitioned multi-worker training (the reference's
# run_offline_multi_node*.sh analogue).  On a single-chip machine this
# validates over a virtual CPU mesh; on a pod slice drop the platform
# override and the same SPMD program runs over ICI/DCN.
MODEL=${1:-TGN}
DATA=${2:-SYNTHETIC}
NDEV=${3:-8}
shift 3 2>/dev/null
cd "$(dirname "$0")/.."
export XLA_FLAGS="--xla_force_host_platform_device_count=${NDEV} ${XLA_FLAGS}"
exec python scripts/offline_edge_prediction_partitioned.py \
  --model "$MODEL" --data "$DATA" --num-devices "$NDEV" --platform cpu "$@"
