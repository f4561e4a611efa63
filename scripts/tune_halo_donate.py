"""Single-chip halo-update variants at 512^3 width-1 periodic (all dims).

Measures the r4 candidates against the functional baseline (8.09 ms in
BENCH_FULL r3):
  1. functional (concat minor-dim form), scanned;
  2. donate=True DUS form, scanned (in-program aliasing);
  3. donate=True top-level dispatch chain (the true production in-place
     path: XLA aliases the donated buffer, writes only slabs);
  4. a Pallas in-place slab-writer kernel (reference case-0 two-slab
     direct writes, halo.h:164-193): 6 async HBM copies on an aliased
     buffer, sequential per dim so corners compose.

    python scripts/tune_halo_donate.py [N]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig


def scan_time(fn, x, iters=32, trials=3):
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


def pallas_slab_writer(shape, h, dtype):
    """In-place periodic self-copy for all 3 dims of a (S,S,S) buffer:
    for each dim, dst[0] <- src[v] and dst[v+h] <- src[h] slabs (v = m =
    S - 2h), applied sequentially (corners compose)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = shape[0]
    m = S - 2 * h
    v = m  # low-halo source plane start (splits[0] == m for P == 1)

    def _sl(i_d, start, size):
        return tuple(slice(None) for _ in range(i_d)) + (pl.ds(start, size),)

    def kernel(x_ref, out_ref, sem):
        for i_d in range(3):
            c1 = pltpu.make_async_copy(out_ref.at[_sl(i_d, v, h)],
                                       out_ref.at[_sl(i_d, 0, h)], sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(out_ref.at[_sl(i_d, h, h)],
                                       out_ref.at[_sl(i_d, v + h, h)], sem)
            c2.start()
            c2.wait()

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    return call


def main(N=512):
    h = 1
    he = (h, h, h)
    periodic = (True, True, True)
    grid = cd.make_grid(GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    shape = grid.global_shape(0, halo_extents=he)
    print(f"buffer {shape}", flush=True)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
        grid.sharding(0))

    fn_func = lambda v: cd.update_halos(grid, v, 0, he, periodic)
    fn_don = lambda v: cd.update_halos(grid, v, 0, he, periodic, donate=True)

    # correctness of the donated form vs functional
    want = jax.jit(fn_func)(x)
    got = jax.jit(fn_don)(x)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"donated-vs-functional max err: {err:g}", flush=True)

    t1 = scan_time(fn_func, x)
    print(f"1. functional scanned:     {t1*1e3:7.3f} ms", flush=True)
    t2 = scan_time(fn_don, x)
    print(f"2. donated-DUS scanned:    {t2*1e3:7.3f} ms", flush=True)

    # 3. top-level donated dispatch chain: issue K dependent dispatches,
    # force completion once; per-op time = (wall - 1 RTT) / K
    from cudecomp_tpu.ops.halo import _build_halo_fn
    fdon = _build_halo_fn(grid, 0, (0, 1, 2), he, periodic, (0, 0, 0), 0,
                          True)
    K = 32
    buf = jax.device_put(np.asarray(jax.device_get(x)), grid.sharding(0))
    buf = fdon(buf)  # compile + warm
    buf = fdon(buf)
    t0 = time.perf_counter()
    for _ in range(K):
        buf = fdon(buf)
    float(jnp.sum(buf))
    t3 = (time.perf_counter() - t0) / K
    print(f"3. donated top-level chain: {t3*1e3:7.3f} ms "
          f"(incl dispatch overhead/K)", flush=True)

    # 4. pallas in-place slab writer
    try:
        pk = pallas_slab_writer(shape, h, jnp.float32)
        got4 = jax.jit(pk)(jax.device_put(np.asarray(jax.device_get(x)),
                                          grid.sharding(0)))
        err4 = float(jnp.max(jnp.abs(want - got4)))
        t4 = scan_time(pk, x)
        print(f"4. pallas slab writer:     {t4*1e3:7.3f} ms  err={err4:g}",
              flush=True)
    except Exception as e:
        print(f"4. pallas slab writer: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
