"""Large-N chained transpose round trip with in-jit data generation.

At 1024^3 f32 a 4 GiB benchmark input argument pushes the program past the
16 GiB HBM (measured r4: 12 GiB temps + 4 GiB argument + 258 MiB reserved
OOMs by exactly the reserve).  Generating the field inside the jit from a
PRNG key removes the argument; the chained mixed-rule cycle then fits.
Timing includes one in-jit generation per run, amortized over ``iters``.

    python scripts/bench_transpose_large.py [N] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig


def main(N=1024, iters=16, n_trials=3):
    grid = cd.make_grid(
        GridConfig(gdims=(N, N, N), pdims=(1, 1),
                   transpose_axis_contiguous=(True, True, True)),
        devices=jax.devices()[:1])

    def roundtrip(a):
        b = cd.transpose_x_to_y(grid, a)
        b = cd.transpose_y_to_z(grid, b)
        b = cd.transpose_z_to_y(grid, b)
        return cd.transpose_y_to_x(grid, b)

    @jax.jit
    def run(key):
        x = jax.random.normal(key, (N, N, N), jnp.float32)

        def body(c, _):
            return roundtrip(c), ()

        out, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(out)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    float(run(key))
    print(f"compile+first run: {time.perf_counter()-t0:.0f}s", flush=True)
    float(run(key))
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        float(run(key))
        ts.append((time.perf_counter() - t0) / iters)
    t = min(ts)
    nbytes = 2 * 4 * N ** 3 * 4  # 4 ops, 1R+1W each, f32
    print(f"{N}^3 f32 transpose round-trip (chained, mixed rule, in-jit "
          f"gen): {t*1e3:.3f} ms  {nbytes/t/1e9:.0f} GB/s effective",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         int(sys.argv[2]) if len(sys.argv) > 2 else 16)
