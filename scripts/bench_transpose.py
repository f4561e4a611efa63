"""Transpose round-trip benchmark (forced-completion methodology).

Times the 4-op round trip X2Y;Y2Z;Z2Y;Y2X — the BASELINE.json headline
metric — through the full engine.  On one chip with axis-contiguous layouts
each op is a real HBM permute (the local-permute hot path); on a mesh the
same script times ICI all-to-alls.

    python scripts/bench_transpose.py [N] [method]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main(N=256, method=None, iters=4, n_trials=3):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig

    devices = jax.devices()
    n_dev = len(devices)
    pr = int(math.isqrt(n_dev))
    while n_dev % pr:
        pr -= 1
    pdims = (pr, n_dev // pr)
    cfg = GridConfig(gdims=(N, N, N), pdims=pdims,
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=devices)

    def cycle(x, _):
        y = cd.transpose_x_to_y(grid, x, method=method)
        z = cd.transpose_y_to_z(grid, y, method=method)
        y2 = cd.transpose_z_to_y(grid, z, method=method)
        return cd.transpose_y_to_x(grid, y2, method=method), ()

    @jax.jit
    def run(x):
        out, _ = lax.scan(cycle, x, None, length=iters)
        return jnp.max(jnp.abs(out - x))

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), grid.global_shape(0),
                          dtype=jnp.float32), grid.sharding(0))
    err = float(run(x))
    assert err == 0.0, err
    float(run(x))
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        float(run(x))
        times.append((time.perf_counter() - t0) / iters)
    t = min(times)
    traffic = 4 * 2 * (N ** 3 / n_dev) * 4  # bytes: 4 ops x r+w per chip
    print(f"{N}^3 f32 round trip ({n_dev} chip, pdims {pdims}, "
          f"method={method or cfg.transpose_method.value}): "
          f"{t*1e3:.3f} ms  ~{traffic/t/1e9:.0f} GB/s/chip")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    m = sys.argv[2] if len(sys.argv) > 2 else None
    main(n, m)
