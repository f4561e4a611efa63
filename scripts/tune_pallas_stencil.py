"""Pallas single-pass 7-point periodic stencil at N^3 (heat3d follow-up).

The XLA form of the fused halo+stencil step runs 21.9 ms at 512^3 (and a
stencil-only control 14.8 ms) — ~6x above the ~2.6 ms HBM floor, because
the minor-dim +/-1 shifted slices each lower as separate relayout passes.
This kernel computes the whole periodic stencil in ONE pass: grid over
x-plane blocks, the +/-x neighbor planes delivered as extra 1-plane
BlockSpecs on the same array (periodic wrap in the index map), y/z
neighbors as in-register rolls.

    python scripts/tune_pallas_stencil.py [N] [Bx]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift, axis):
    try:
        return pltpu.roll(x, shift, axis)
    except Exception:
        return jnp.roll(x, shift, axis=axis)


def make_kernel(N, Bx, dt, interpret=False):
    def kernel(cur_ref, prev_ref, next_ref, out_ref):
        cur = cur_ref[...]
        up = jnp.concatenate([prev_ref[...], cur[:-1]], axis=0)
        down = jnp.concatenate([cur[1:], next_ref[...]], axis=0)
        lap = (up + down
               + _roll(cur, 1, 1) + _roll(cur, -1, 1)
               + _roll(cur, 1, 2) + _roll(cur, -1, 2)
               - 6.0 * cur)
        out_ref[...] = cur + dt * lap

    grid = (N // Bx,)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    def step(u):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bx, N, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, N, N),
                             lambda i: ((i * Bx - 1) % N, 0, 0)),
                pl.BlockSpec((1, N, N),
                             lambda i: (((i + 1) * Bx) % N, 0, 0)),
            ],
            out_specs=pl.BlockSpec((Bx, N, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
            interpret=interpret,
            **params,
        )(u, u, u)

    return step


def xla_step(u, dt):
    lap = sum(jnp.roll(u, s, axis=d) for d in range(3) for s in (-1, 1)
              ) - 6.0 * u
    return u + dt * lap


def main(N=512, Bx=8, iters=32):
    dt = 0.1
    interpret = os.environ.get("CUDECOMP_TPU_PALLAS_INTERPRET", "0") == "1"
    u = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
    step = make_kernel(N, Bx, dt, interpret)

    t0 = time.perf_counter()
    err = float(jax.jit(
        lambda v: jnp.max(jnp.abs(step(v) - xla_step(v, dt))))(u))
    print(f"err={err:g} (compile+gate {time.perf_counter()-t0:.0f}s)",
          flush=True)
    assert err < 1e-5, err

    for label, fn in (("pallas", step),
                      ("xla-roll", lambda v: xla_step(v, dt))):
        @jax.jit
        def run(v, fn=fn):
            out = lax.scan(lambda c, _: (fn(c), ()), v, None, length=iters)[0]
            return jnp.sum(out)

        float(run(u)); float(run(u))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(u))
            ts.append((time.perf_counter() - t0) / iters)
        t = min(ts)
        nbytes = 2 * N ** 3 * 4
        print(f"{N}^3 Bx={Bx} {label}: {t*1e3:.3f} ms/step  "
              f"{nbytes/t/1e9:.0f} GB/s (1R+1W)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
