"""Per-op profile of the single-chip transpose round trip (VERDICT r2 #1).

Measures, at 512^3 (and 256^3 for cross-checks), forced completion:
  a. scanned PURE jnp.transpose cyclic permutes (does XLA fold them? if the
     time is physically real, the *1.0000001 pin in segment_roundtrip is
     unnecessary and costs an extra HBM pass per op)
  b. scanned transpose * 1.0000001  (the current segment_roundtrip method)
  c. the 4 engine ops, pure and pinned
  d. the chained 4-op round trip, pure (identity composition — expected to
     fold) and with ONE trailing multiply

    python scripts/profile_transpose512.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=32, trials=3):
    @jax.jit
    def run(v):
        def body(c, _):
            return fn(c), ()
        out, _ = lax.scan(body, v, None, length=iters)
        return jnp.sum(out)

    float(run(x))
    float(run(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def report(tag, t, nbytes):
    print(f"{tag:44s} {t*1e3:8.3f} ms  {nbytes/t/1e9:6.0f} GB/s", flush=True)


def main(N=512):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32),
        jax.devices()[0])
    nb = 2 * x.size * 4  # 1R + 1W

    report("pure permute (1,2,0)",
           timeit(lambda v: jnp.transpose(v, (1, 2, 0)), x), nb)
    report("pure permute (2,0,1)",
           timeit(lambda v: jnp.transpose(v, (2, 0, 1)), x), nb)
    report("permute (1,2,0) * 1.0000001",
           timeit(lambda v: jnp.transpose(v, (1, 2, 0)) * 1.0000001, x), nb)
    report("elementwise only (v * 1.0000001)",
           timeit(lambda v: v * 1.0000001, x), nb)

    cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1),
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=jax.devices()[:1])
    ops = [(cd.transpose_x_to_y, "x2y"), (cd.transpose_y_to_z, "y2z"),
           (cd.transpose_z_to_y, "z2y"), (cd.transpose_y_to_x, "y2x")]
    tot_pure = tot_pin = 0.0
    for op, tag in ops:
        t = timeit(lambda v, op=op: op(grid, v), x)
        tot_pure += t
        report(f"engine {tag} pure", t, nb)
        t = timeit(lambda v, op=op: op(grid, v) * 1.0000001, x)
        tot_pin += t
        report(f"engine {tag} *1.0000001", t, nb)
    print(f"4-op totals: pure {tot_pure*1e3:.3f} ms | "
          f"pinned {tot_pin*1e3:.3f} ms", flush=True)

    def rt(v):
        for op, _ in ops:
            v = op(grid, v)
        return v

    report("chained roundtrip pure (fold check)", timeit(rt, x), 4 * nb)
    report("chained roundtrip * 1.0000001",
           timeit(lambda v: rt(v) * 1.0000001, x), 4 * nb)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
