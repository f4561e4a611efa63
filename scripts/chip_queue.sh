#!/bin/bash
# Wait for the axon TPU to recover, then run the queued chip jobs serially
# (one jax process at a time on the tunnel — BENCH_NOTES.md).  Appends
# everything to /tmp/chip_queue.log so an unattended recovery window is
# fully captured.
cd /root/repo
LOG=/tmp/chip_queue.log
probe() {
  timeout 90 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jax.device_put(np.ones((256,256), np.float32))
assert float(jax.jit(lambda v: jnp.sum(v*2))(x)) == 131072.0
print('HEALTHY')" 2>/dev/null | grep -q HEALTHY
}

for i in $(seq 1 90); do
  if probe; then
    echo "[chip_queue] healthy after $i probes $(date)" | tee -a "$LOG"
    echo "[chip_queue] 1/3 corruption retry probe" | tee -a "$LOG"
    timeout 900 python scripts/retry_corruption.py 2>&1 | tail -5 | tee -a "$LOG"
    echo "[chip_queue] 2/3 bench_full refresh" | tee -a "$LOG"
    timeout 580 python bench_full.py 2>&1 | grep '^{' | tee -a "$LOG"
    echo "[chip_queue] 3/3 bench.py sanity" | tee -a "$LOG"
    timeout 580 python bench.py 2>&1 | grep '^{' | tee -a "$LOG"
    echo "[chip_queue] done $(date)" | tee -a "$LOG"
    exit 0
  fi
  echo "[chip_queue] probe $i unhealthy $(date)" >> "$LOG"
  sleep 240
done
echo "[chip_queue] gave up $(date)" | tee -a "$LOG"
exit 1
