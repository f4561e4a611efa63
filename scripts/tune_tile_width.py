"""Wide-tile hypothesis for the cyclic-permute kernel (r4 follow-up).

The committed 1024^3 cycle (8 MB (1024,2048) blocks) ran at 505 GB/s —
ABOVE the 481 GB/s of 512^3/768^3 with their square measured-default
tiles.  Hypothesis: widening the long-axis tile (fewer, fatter blocks)
improves the DMA pattern at every size, and the square preference is an
artifact of only having measured square options below 1024^3.

This patches ``_plan_tiles`` so BOTH cyclic views of an N^3 permute use
(short_extent, W) tiles — the short side is whole (<= 1024 rows/cols)
and the long side is ``W`` — then times the ENGINE's chained mixed-rule
round trip (the only fold-proof, scan-copy-free venue; BENCH_NOTES.md r4
"permute tile planner").

    python scripts/tune_tile_width.py N W [iters]     # patched width W
    python scripts/tune_tile_width.py N default [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main(N, width, iters=16):
    import cudecomp_tpu as cd
    import cudecomp_tpu.ops.pallas_kernels as pk
    from cudecomp_tpu.config import GridConfig

    orig = pk._plan_tiles
    if width != "default":
        W = int(width)

        def plan(M, Nc, itemsize=4):
            if M <= 1024 and Nc % W == 0:
                tm, tn = M, W
            elif Nc <= 1024 and M % W == 0:
                tm, tn = W, Nc
            else:
                return orig(M, Nc, itemsize)
            if tm * tn * itemsize > 3 * pk._TILE_BYTES_CAP:
                return orig(M, Nc, itemsize)
            return tm, tn

        pk._plan_tiles = plan

    grid = cd.make_grid(
        GridConfig(gdims=(N, N, N), pdims=(1, 1),
                   transpose_axis_contiguous=(True, True, True)),
        devices=jax.devices()[:1])

    def roundtrip(a):
        b = cd.transpose_x_to_y(grid, a)
        b = cd.transpose_y_to_z(grid, b)
        b = cd.transpose_z_to_y(grid, b)
        return cd.transpose_y_to_x(grid, b)

    # correctness gate (one cycle is the identity on values)
    x_small = jax.random.normal(jax.random.PRNGKey(1), (N, N, N), jnp.float32)
    t0 = time.perf_counter()
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(roundtrip(v) - v)))(x_small))
    print(f"gate err={err:g} (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)
    assert err == 0.0, err

    @jax.jit
    def run(key):
        x = jax.random.normal(key, (N, N, N), jnp.float32)
        out = lax.scan(lambda c, _: (roundtrip(c), ()), x, None,
                       length=iters)[0]
        return jnp.sum(out)

    key = jax.random.PRNGKey(0)
    float(run(key))
    float(run(key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append((time.perf_counter() - t0) / iters)
    t = min(ts)
    nbytes = 2 * 4 * N ** 3 * 4
    print(f"{N}^3 width={width}: {t*1e3:.3f} ms  {nbytes/t/1e9:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 16)
