#!/bin/bash
# One-shot on-chip validation after a tunnel outage (or any round wrap-up):
#   bash tools/tpu_recheck.sh
# Runs the real-TPU test lane, the flagship bench, and the IVF bench.
# Each step bounded; results land in /tmp/tpu_recheck.log.
set -x
LOG=/tmp/tpu_recheck.log
: > "$LOG"
{
  echo "=== devices ==="
  timeout 590 python -c "import jax; print(jax.devices())" || exit 1
  echo "=== tpu test lane ==="
  timeout 590 env ANYLOC_TPU_LANE=1 python -m pytest tests -m tpu -q
  echo "=== flagship bench ==="
  timeout 590 python bench.py
  echo "=== ivf bench (250k x 512) ==="
  timeout 590 python tools/bench_ivf.py --n-db 250000 --dim 512 \
      --n-cells 512 --n-probe 16
} 2>&1 | tee -a "$LOG"
