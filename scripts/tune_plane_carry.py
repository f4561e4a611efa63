"""Plane-carried vs interleaved split-complex FFT round trips (r3).

The profiler trace of the 256^3 c2c cycle (scripts/profile_fft.py) shows
two per-iteration ops that are NOT FFT math: a concatenate fusion from the
trailing ``jnp.stack([r, i], -1)`` of fft_split_axes (mxu_fft.py) and a
layout-reconciling copy of the interleaved loop carry — together ~0.8 ms of
a 5.7 ms round trip.  Carrying the (re, im) planes as a pytree across
chained transforms (DistributedFFT.forward_planes / inverse_planes) should
remove both.  cuFFT's interleaved complex layout is native on GPUs; the
plane pair is the native spectral format on TPU.

    python scripts/tune_plane_carry.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

os.environ.setdefault("CUDECOMP_TPU_FFT_PRECISION", "high")


def bench(N, form, iters=20, n_trials=3):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu.ops.fft import DistributedFFT

    cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1))
    grid = cd.make_grid(cfg, devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, split_complex=True)

    key = jax.random.PRNGKey(0)
    if form == "interleaved":
        x0 = jax.device_put(
            jax.random.normal(key, (N, N, N, 2), jnp.float32),
            grid.sharding(0))
        cycle = lambda v: plan.inverse(plan.forward(v))
        err_of = lambda v, w: jnp.max(jnp.abs(w - v))
    else:
        r0 = jax.device_put(jax.random.normal(key, (N, N, N), jnp.float32),
                            grid.sharding(0))
        i0 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (N, N, N), jnp.float32),
            grid.sharding(0))
        x0 = (r0, i0)
        cycle = lambda v: plan.inverse_planes(plan.forward_planes(v))
        err_of = lambda v, w: jnp.maximum(jnp.max(jnp.abs(w[0] - v[0])),
                                          jnp.max(jnp.abs(w[1] - v[1])))

    @jax.jit
    def gate(v):
        return err_of(v, cycle(v))

    err = float(gate(x0))

    @jax.jit
    def run(v):
        out, _ = lax.scan(lambda c, _: (cycle(c), ()), v, None, length=iters)
        return err_of(v, out)

    float(run(x0))
    float(run(x0))
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        float(run(x0))
        ts.append((time.perf_counter() - t0) / iters / 2.0)
    t = min(ts)
    gflops = 5.0 * N ** 3 * math.log2(N ** 3) / t / 1e9
    g = "PASS" if err < 5e-4 else "FAIL"
    print(f"N={N} {form:12s} err {err:.2e} [{g}]  {t*1e3:7.2f} ms/dir  "
          f"{gflops:7.1f} GFLOPS", flush=True)


def main():
    for N in (256, 512):
        for form in ("interleaved", "planes"):
            bench(N, form)


if __name__ == "__main__":
    main()
