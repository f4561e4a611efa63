"""Capture a profiler trace of the 256^3 MXU FFT and print the op breakdown.

    CUDECOMP_TPU_FFT_PRECISION=high python scripts/profile_fft.py
"""

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main(N=256, ITERS=4):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu.ops.fft import DistributedFFT

    cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1))
    grid = cd.make_grid(cfg, devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, split_complex=True)

    @jax.jit
    def run(x):
        def body(c, _):
            return plan.inverse(plan.forward(c)), ()
        out, _ = lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out[..., :1])

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, N, N, 2), jnp.float32),
        grid.sharding(0))
    float(run(x))  # compile+warm
    float(run(x))

    logdir = "/tmp/fftprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(run(x))

    # crude op-time extraction from the xplane protobuf via the trace-events
    # json if present; otherwise just report file location
    evs = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not evs:
        print("trace captured at", logdir,
              glob.glob(f"{logdir}/**/*", recursive=True)[-5:])
        return
    import json as js
    from collections import defaultdict
    with gzip.open(evs[0], "rt") as f:
        data = js.load(f)
    # keep only TPU-device lanes (the host lanes record dispatch, not
    # execution) and full op names — fusion.N instances are distinct ops
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n}
    tot, cnt = defaultdict(float), defaultdict(int)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and (
                not dev_pids or e.get("pid") in dev_pids):
            nm = e.get("name", "?")
            tot[nm] += e["dur"]
            cnt[nm] += 1
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1e3:10.3f} ms  x{cnt[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
