#!/bin/bash
# Multi-process partitioned training — the torchrun analogue
# (reference: scripts/run_offline_multi_node.sh, c10d rendezvous).
#
# Pod-slice launch (one invocation per host; TPU discovers local chips):
#   scripts/run_multiprocess.sh TGN REDDIT $NUM_HOSTS $HOST_INDEX \
#       $COORDINATOR_HOST:12345
#
# Local CPU validation (spawns all processes on this machine, each with
# LOCAL_DEVICES virtual devices):
#   scripts/run_multiprocess.sh TGN SYNTHETIC 2 all localhost:29741
MODEL=${1:-TGN}
DATA=${2:-SYNTHETIC}
NPROC=${3:-2}
PROC_ID=${4:-all}
COORD=${5:-localhost:29741}
LOCAL_DEVICES=${LOCAL_DEVICES:-4}
shift 5 2>/dev/null
cd "$(dirname "$0")/.."

run_one() {
  XLA_FLAGS="--xla_force_host_platform_device_count=${LOCAL_DEVICES}" \
  python scripts/offline_edge_prediction_multiprocess.py \
    --model "$MODEL" --data "$DATA" \
    --coordinator "$COORD" --num-processes "$NPROC" --process-id "$1" \
    --platform cpu "${@:2}"
}

if [ "$PROC_ID" = "all" ]; then
  pids=()
  for ((i = 0; i < NPROC; i++)); do
    run_one "$i" "$@" 2>&1 | sed "s/^/[p$i] /" &
    pids+=($!)
  done
  status=0
  for p in "${pids[@]}"; do wait "$p" || status=1; done
  exit $status
else
  # real pod slice: no platform/device-count overrides
  exec python scripts/offline_edge_prediction_multiprocess.py \
    --model "$MODEL" --data "$DATA" \
    --coordinator "$COORD" --num-processes "$NPROC" \
    --process-id "$PROC_ID" "$@"
fi
