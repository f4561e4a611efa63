#!/bin/bash
# Wait for the axon TPU to recover, then run the queued chip jobs serially
# (one jax process at a time on the tunnel — BENCH_NOTES.md).
cd /root/repo
probe() {
  timeout 90 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jax.device_put(np.ones((256,256), np.float32))
assert float(jax.jit(lambda v: jnp.sum(v*2))(x)) == 131072.0
print('HEALTHY')" 2>/dev/null | grep -q HEALTHY
}

for i in $(seq 1 60); do
  if probe; then
    echo "[chip_queue] healthy after $i probes $(date)"
    echo "[chip_queue] running bench_full"
    timeout 580 python bench_full.py 2>&1 | grep '^{'
    exit 0
  fi
  echo "[chip_queue] probe $i unhealthy $(date)"
  sleep 240
done
echo "[chip_queue] gave up"
exit 1
