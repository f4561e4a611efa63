"""Chip experiment: can laplacian7 route through the generic stencil_apply?

The self-review (r4) flagged that the specialized 7-point kernel
(_kernel/_apply_local) and the generic 27-tap kernel
(_stencil27_kernel/_stencil_apply_impl) duplicate the Pallas scaffold.
Unifying them is only safe if the generic path matches the specialized
one's measured 4.4 ms/512^3 diffusion-step headline (BENCH_NOTES.md r4) —
their dispatches differ (8 MB block cap + pure in-register rolls vs
tap-loop with a 4 MB cap for dense sets; face-only sets keep 8 MB).

Run on the chip (one process, nothing >= 768^3 before it):

    python scripts/tune_unify_stencil.py [N]

Prints one JSON line per variant; if the stencil_apply-routed 7-tap form
ties the specialized kernel, the dedup refactor is green-lit.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, x, iters=32, n_trials=3, n_warmup=2):
    @jax.jit
    def run(v):
        def body(c, _):
            return fn(c), ()
        out, _ = lax.scan(body, v, None, length=iters)
        return jnp.sum(out * 1e-9)

    for _ in range(n_warmup):
        float(run(x))
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main(N=512):
    import cudecomp_tpu as cd

    grid = cd.make_grid(cd.GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32),
        grid.sharding(0))
    periods = (True, True, True)
    dt = 0.1

    # the 7-point diffusion step as a stencil_apply weight set:
    # w = I + dt * lap  ->  center 1 - 6 dt, faces dt
    w = np.zeros((3, 3, 3), np.float64)
    for d in range(3):
        lo = [1, 1, 1]
        hi = [1, 1, 1]
        lo[d], hi[d] = 0, 2
        w[tuple(lo)] = w[tuple(hi)] = dt
    w[1, 1, 1] = 1.0 - 6.0 * dt

    # correctness gate first (tiny grid, bit comparison)
    g0 = cd.make_grid(cd.GridConfig(gdims=(64, 64, 64), pdims=(1, 1)),
                      devices=jax.devices()[:1])
    x0 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (64, 64, 64), jnp.float32),
        g0.sharding(0))
    a = np.asarray(cd.diffusion_step(g0, x0, dt, 0, periods))
    b = np.asarray(cd.stencil_apply(g0, x0, w, 0, periods))
    gate = float(np.abs(a - b).max())
    print(json.dumps({"gate_64^3_maxdiff": gate}), flush=True)
    assert gate < 1e-5, gate

    for name, fn in (
        ("specialized_diffusion_step",
         lambda v: cd.diffusion_step(grid, v, dt, 0, periods)),
        ("stencil_apply_7tap",
         lambda v: cd.stencil_apply(grid, v, w, 0, periods)),
    ):
        t = timed(fn, x)
        print(json.dumps({"variant": name, "N": N,
                          "ms_per_step": round(t * 1e3, 3),
                          "gbps_1r1w": round(2 * 4 * N ** 3 / t / 1e9, 1)}),
              flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
