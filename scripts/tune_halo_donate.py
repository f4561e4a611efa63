"""Single-chip halo-update variants at 512^3 width-1 periodic (all dims).

Measures one r4 candidate per invocation (remote compiles can take many
minutes each, so each process compiles as little as possible) against the
functional baseline (8.09 ms in BENCH_FULL r3):

  func   - functional (concat minor-dim form), scanned;
  don    - donate=True DUS form, scanned (in-program aliasing);
  chain  - donate=True top-level dispatch chain (true production in-place
           path: XLA aliases the donated buffer, writes only slabs);
  pallas - Pallas in-place slab-writer kernel (reference case-0 two-slab
           direct writes, halo.h:164-193): 6 async HBM copies on an
           aliased buffer, sequential per dim so corners compose.

Correctness is gated at 64^3 against the functional path in-process
(cheap compile), before the big timing run.

    python scripts/tune_halo_donate.py VARIANT [N]
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

H = 1
HE = (H, H, H)
PERIODIC = (True, True, True)


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


def pallas_slab_writer(shape, dtype):
    """In-place periodic self-copy for all 3 dims: dst[0] <- src[v] and
    dst[v+h] <- src[h] slabs per dim (v = m = S - 2h), sequential."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = H
    S = shape[0]
    v = S - 2 * h

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


def make_variant(variant, grid, shape):
    if variant == "func":
        return lambda v: cd.update_halos(grid, v, 0, HE, PERIODIC)
    if variant in ("don", "chain"):
        return lambda v: cd.update_halos(grid, v, 0, HE, PERIODIC,
                                         donate=True)
    if variant == "pallas":
        return pallas_slab_writer(shape, jnp.float32)
    if variant == "gather":
        # minor-dim halo write as a constant-index lane gather: one fused
        # pass (out[..., k] = in[..., perm[k]] with perm = [v, 1..v, 1])
        # instead of concat + separately-materialized middle slice
        S = shape[0]
        v = S - 2 * H
        perm = np.arange(S)
        perm[:H] = np.arange(v, v + H)
        perm[v + H:] = np.arange(H, 2 * H)
        perm_j = jnp.asarray(perm)

        def fn(x):
            x = lax.dynamic_update_slice_in_dim(
                x, lax.dynamic_slice_in_dim(x, v, H, axis=0), 0, axis=0)
            x = lax.dynamic_update_slice_in_dim(
                x, lax.dynamic_slice_in_dim(x, H, H, axis=0), v + H, axis=0)
            x = lax.dynamic_update_slice_in_dim(
                x, lax.dynamic_slice_in_dim(x, v, H, axis=1), 0, axis=1)
            x = lax.dynamic_update_slice_in_dim(
                x, lax.dynamic_slice_in_dim(x, H, H, axis=1), v + H, axis=1)
            return jnp.take(x, perm_j, axis=2)

        return fn
    raise SystemExit(f"unknown variant {variant}")


def gate_64(variant):
    grid = cd.make_grid(GridConfig(gdims=(64,) * 3, pdims=(1, 1)),
                        devices=jax.devices()[:1])
    shape = grid.global_shape(0, halo_extents=HE)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
        grid.sharding(0))
    want = jax.jit(lambda v: cd.update_halos(grid, v, 0, HE, PERIODIC))(x)
    got = jax.jit(make_variant(variant, grid, shape))(x)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"64^3 gate err vs functional: {err:g}", flush=True)
    assert err == 0.0, "variant disagrees with functional halo update"


def main(variant, N=512):
    t_all = time.perf_counter()
    if variant != "func":
        gate_64(variant)
    grid = cd.make_grid(GridConfig(gdims=(N, N, N), pdims=(1, 1)),
                        devices=jax.devices()[:1])
    shape = grid.global_shape(0, halo_extents=HE)
    print(f"buffer {shape}  ({time.perf_counter()-t_all:.0f}s)", flush=True)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
        grid.sharding(0))
    fn = make_variant(variant, grid, shape)

    if variant == "chain":
        from cudecomp_tpu.ops.halo import _build_halo_fn
        fdon = _build_halo_fn(grid, 0, (0, 1, 2), HE, PERIODIC, (0, 0, 0),
                              0, True)
        K = 32
        buf = fdon(x)  # compile + warm (consumes x)
        buf = fdon(buf)
        t0 = time.perf_counter()
        for _ in range(K):
            buf = fdon(buf)
        float(jnp.sum(buf))
        t = (time.perf_counter() - t0) / K
    else:
        t = scan_time(fn, x)
    print(f"{variant} @ {N}^3: {t*1e3:.3f} ms  "
          f"(total {time.perf_counter()-t_all:.0f}s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 512)
