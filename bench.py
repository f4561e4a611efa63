"""Benchmark — transpose round-trip through the full cudecomp_tpu engine.

Methodology mirrors the reference autotuner trials (src/autotune.cc:541-626):
the 4-op round trip X2Y;Y2Z;Z2Y;Y2X, warmup + timed trials.  To amortize the
per-dispatch latency of the remote-TPU tunnel, ITERS round trips run inside
one jit via lax.scan and the wall time is divided by ITERS.

On one chip the round trip exercises the engine's slab/local paths (real HBM
data movement with axis-contiguous layouts — the local-permute hot path that
the reference implements with cuTENSOR).  On a multi-chip mesh the same code
times real ICI all-to-alls.

Complex dtypes are unimplemented on this chip's runtime, so the benchmark
uses float32; bytes-based bandwidth is the comparable quantity.
vs_baseline = achieved GB/s per chip vs the reference's effective per-GPU
all-to-all bandwidth at its best 2048^3 double round trip (~276 GB/s,
BASELINE.md) — cross-hardware, indicative only.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import math
import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig

    devices = jax.devices()
    n_dev = len(devices)
    pr = int(math.isqrt(n_dev))
    while n_dev % pr:
        pr -= 1
    pdims = (pr, n_dev // pr)

    N = 256
    ITERS = 10
    cfg = GridConfig(gdims=(N, N, N), pdims=pdims,
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=devices)

    def cycle(x, _):
        y = cd.transpose_x_to_y(grid, x)
        z = cd.transpose_y_to_z(grid, y)
        y2 = cd.transpose_z_to_y(grid, z)
        return cd.transpose_y_to_x(grid, y2), ()

    @jax.jit
    def run(x):
        out, _ = lax.scan(cycle, x, None, length=ITERS)
        return out

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), grid.global_shape(0),
                          dtype=jnp.float32),
        grid.sharding(0))

    # correctness gate: ITERS round trips preserve the field exactly
    out = jax.block_until_ready(run(x))
    err = float(jnp.max(jnp.abs(out - x)))
    assert err == 0.0, f"transpose round-trip max err {err}"

    for _ in range(3):
        jax.block_until_ready(run(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        times.append((time.perf_counter() - t0) / ITERS)

    t = min(times)
    ms = t * 1e3
    # traffic: 4 ops x (read + write) of the local shard
    elem_bytes = 4
    local_elems = N ** 3 / n_dev
    gbps_chip = 4 * 2 * local_elems * elem_bytes / t / 1e9
    baseline_gbps = 276.0  # effective per-GPU a2a BW, BASELINE.md derived row

    print(json.dumps({
        "metric": f"{N}^3 f32 transpose round-trip (4 ops, {n_dev} chip"
                  f"{'s' if n_dev > 1 else ''}, pdims {pdims}, "
                  f"axis-contiguous)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(gbps_chip / baseline_gbps, 4),
    }))


if __name__ == "__main__":
    main()
