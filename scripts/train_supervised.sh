#!/bin/bash
# Supervised training: pair with --watchdog_min N. The watchdog exits 114
# when the host loop makes no progress (hung relay call — see
# utils/system.StallWatchdog); this wrapper restarts with --resume, which
# continues losslessly from the latest train-state checkpoint.
#
#   scripts/train_supervised.sh -s <scene> -m <out> --watchdog_min 30 ...
set -u
python -m splatfields_tpu.train "$@"
rc=$?
while [ $rc -eq 114 ]; do
  echo "[supervise] stall watchdog fired - resuming from latest checkpoint"
  python -m splatfields_tpu.train "$@" --resume
  rc=$?
done
exit $rc
