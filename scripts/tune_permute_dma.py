"""Manual-DMA cyclic-permute kernels: 3D std layout in and out, no glue.

BlockSpec-based 3D permute kernels are stuck at ~208 GB/s: legality
forces blocks spanning >=8 sublanes in the outer dim (8 MB tiles at the
fast 512x512 transpose shape -> VMEM OOM).  This kernel keeps both HBM
operands un-blocked (memory_space=ANY) and hand-pipelines plane DMAs:

  120: for j: out[j, :, :] = in[:, j, :].T     (I,J,K) -> (J,K,I)
  201: for i: out[:, i, :] = in[i, :, :].T     (I,J,K) -> (K,I,J)

Each step moves one (N, N) plane (1 MB f32 at N=512) through a
double-buffered VMEM slot pair; the in-VMEM transpose is the shape
Mosaic is fast at.  One side of each DMA is fully contiguous, the other
reads/writes one sublane row per (8,128) tile (512 B runs).

    python scripts/tune_permute_dma.py [N]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pipeline(n_steps, get_in, put_out, compute):
    """Generic 2-slot in/out DMA pipeline: prefetch j+1, compute j,
    drain out-DMAs two steps behind."""
    get_in(0, 0).start()

    def loop(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_steps)
        def _():
            get_in((j + 1) % 2, j + 1).start()

        get_in(slot, j).wait()

        @pl.when(j >= 2)
        def _():
            put_out(slot, j - 2).wait()

        compute(slot)
        put_out(slot, j).start()
        return ()

    lax.fori_loop(0, n_steps, loop, (), unroll=False)
    if n_steps >= 2:  # static: drain the second-to-last slot's out-DMA
        put_out(n_steps % 2, n_steps - 2).wait()
    put_out((n_steps - 1) % 2, n_steps - 1).wait()


def permute_dma_120(x, interpret=False):
    """out[a,b,c] = x[c,a,b]: (I,J,K) -> (J,K,I), plane pipeline over J."""
    I, J, K = x.shape

    def kern(x_hbm, o_hbm):
        def body(ivm, ovm, isem, osem):
            def get_in(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[:, j, :], ivm.at[slot], isem.at[slot])

            def put_out(slot, j):
                return pltpu.make_async_copy(
                    ovm.at[slot], o_hbm.at[j], osem.at[slot])

            def compute(slot):
                ovm[slot] = ivm[slot].T

            _pipeline(J, get_in, put_out, compute)

        pl.run_scoped(
            body,
            ivm=pltpu.VMEM((2, I, K), x.dtype),
            ovm=pltpu.VMEM((2, K, I), x.dtype),
            isem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((J, K, I), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        interpret=interpret,
    )(x)


def permute_dma_201(x, interpret=False):
    """out[a,b,c] = x[b,c,a]: (I,J,K) -> (K,I,J), plane pipeline over I."""
    I, J, K = x.shape

    def kern(x_hbm, o_hbm):
        def body(ivm, ovm, isem, osem):
            def get_in(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[i], ivm.at[slot], isem.at[slot])

            def put_out(slot, i):
                return pltpu.make_async_copy(
                    ovm.at[slot], o_hbm.at[:, i, :], osem.at[slot])

            def compute(slot):
                ovm[slot] = ivm[slot].T

            _pipeline(I, get_in, put_out, compute)

        pl.run_scoped(
            body,
            ivm=pltpu.VMEM((2, J, K), x.dtype),
            ovm=pltpu.VMEM((2, K, J), x.dtype),
            isem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, I, J), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        interpret=interpret,
    )(x)


def timeit(fn, x, iters=16, trials=5):
    @jax.jit
    def run(a):
        out, _ = lax.scan(lambda c, _: (fn(c), ()), a, None, length=iters)
        return jnp.sum(out[:1, :1, :1])

    float(run(x)); float(run(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main(N=512):
    nb = 2 * N * N * N * 4 / 1e9

    s = (64, 32, 256)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal(s),
                     jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(permute_dma_120(xs)),
        np.transpose(np.asarray(xs), (1, 2, 0)))
    np.testing.assert_array_equal(
        np.asarray(permute_dma_201(xs)),
        np.transpose(np.asarray(xs), (2, 0, 1)))
    print("correctness OK")

    x = jax.device_put(np.zeros((N, N, N), np.float32))
    t120 = timeit(permute_dma_120, x)
    print(f"dma_120: {t120*1e3:7.2f} ms  {nb/t120:6.1f} GB/s")
    t201 = timeit(permute_dma_201, x)
    print(f"dma_201: {t201*1e3:7.2f} ms  {nb/t201:6.1f} GB/s")

    def rt(a):
        a = permute_dma_120(a)
        a = permute_dma_120(a)
        a = permute_dma_201(a)
        return permute_dma_201(a)

    t = timeit(rt, x)
    print(f"chained dma roundtrip: {t*1e3:.2f} ms ({4*nb/t:.1f} GB/s agg)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
