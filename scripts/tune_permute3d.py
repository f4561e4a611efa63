"""Prototype: native 3D Pallas cyclic-permute kernels vs the 2D-view kernel.

The 2D-view pallas_cyclic_permute needs reshape(M,N) views at its
boundaries; under TPU tiled layouts two of the four inter-op transitions
in a chained round trip lower to PHYSICAL reshapes (2.3-3.0 ms each at
512^3) plus scan-carry copies — 8.5 ms of the 15 ms device time is
glue, not permutation.  A kernel with 3D operands and 3D results in
standard {2,1,0} layout removes every boundary reshape.

Variants (Mosaic materializes a naive in-kernel 3D jnp.transpose at 24x
the block size -> VMEM OOM, so each variant reduces to a 2D tile
transpose):

  120b: in (ti,tj,K), out (tj,K,ti): 2D reshape -> T -> reshape
  201a: in (ti,J,tk), out (tk,ti,J): 2D reshape -> T -> reshape

    python scripts/tune_permute3d.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def permute3d_120b(x, ti=128, tj=8, interpret=False):
    """out[a,b,c] = x[c,a,b]; 2D reshape-transpose inside the kernel."""
    I, J, K = x.shape

    def kern(xr, outr):
        outr[:] = xr[:].reshape(ti, tj * K).T.reshape(tj, K, ti)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((J, K, I), x.dtype),
        grid=(I // ti, J // tj),
        in_specs=[pl.BlockSpec((ti, tj, K), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tj, K, ti), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def permute3d_201a(x, ti=8, tk=128, interpret=False):
    """out[a,b,c] = x[b,c,a]; 2D reshape-transpose inside the kernel."""
    I, J, K = x.shape

    def kern(xr, outr):
        outr[:] = xr[:].reshape(ti * J, tk).T.reshape(tk, ti, J)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, I, J), x.dtype),
        grid=(I // ti, K // tk),
        in_specs=[pl.BlockSpec((ti, J, tk), lambda i, k: (i, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk, ti, J), lambda i, k: (k, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def permute3d_120c(x, ti=128, tj=8, interpret=False):
    """out[a,b,c] = x[c,a,b]; per-j-slice native 2D transposes, no
    in-kernel reshape (Mosaic relayouts cost 3x)."""
    I, J, K = x.shape

    def kern(xr, outr):
        for j in range(tj):
            outr[j, :, :] = xr[:, j, :].T

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((J, K, I), x.dtype),
        grid=(I // ti, J // tj),
        in_specs=[pl.BlockSpec((ti, tj, K), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tj, K, ti), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def permute3d_201c(x, ti=8, tk=128, interpret=False):
    """out[a,b,c] = x[b,c,a]; per-i-slice native 2D transposes."""
    I, J, K = x.shape

    def kern(xr, outr):
        for i in range(ti):
            outr[:, i, :] = xr[i, :, :].T

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, I, J), x.dtype),
        grid=(I // ti, K // tk),
        in_specs=[pl.BlockSpec((ti, J, tk), lambda i, k: (i, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk, ti, J), lambda i, k: (k, i, 0),
                               memory_space=pltpu.VMEM),
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


def check(got, want):
    np.testing.assert_array_equal(np.asarray(got), want)


def main(N=512):
    nb = 2 * N * N * N * 4 / 1e9  # read + write GB

    # correctness (small but lane-aligned: in-kernel reshapes need the
    # vector lane dim to stay 128-aligned)
    s = (128, 128, 256)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal(s),
                     jnp.float32)
    w120 = np.transpose(np.asarray(xs), (1, 2, 0))
    w201 = np.transpose(np.asarray(xs), (2, 0, 1))
    check(permute3d_120b(xs, ti=128, tj=8), w120)
    check(permute3d_201a(xs, ti=8, tk=128), w201)
    check(permute3d_120c(xs, ti=128, tj=8), w120)
    check(permute3d_201c(xs, ti=8, tk=128), w201)
    print("correctness OK")

    x = jax.device_put(np.zeros((N, N, N), np.float32))

    results = {}
    for tag, fn in (
        ("120b ti=128 tj=8", lambda v: permute3d_120b(v, 128, 8)),
        ("120b ti=256 tj=8", lambda v: permute3d_120b(v, 256, 8)),
        ("120b ti=128 tj=16", lambda v: permute3d_120b(v, 128, 16)),
        ("201a ti=8 tk=128", lambda v: permute3d_201a(v, 8, 128)),
        ("201a ti=8 tk=256", lambda v: permute3d_201a(v, 8, 256)),
        ("201a ti=16 tk=128", lambda v: permute3d_201a(v, 16, 128)),
        ("120c ti=128 tj=8", lambda v: permute3d_120c(v, 128, 8)),
        ("120c ti=512 tj=8", lambda v: permute3d_120c(v, 512, 8)),
        ("201c ti=8 tk=128", lambda v: permute3d_201c(v, 8, 128)),
        ("201c ti=8 tk=512", lambda v: permute3d_201c(v, 8, 512)),
    ):
        try:
            t = timeit(fn, x)
        except Exception as e:
            print(f"{tag}: FAILED ({str(e)[:90]})")
            continue
        results[tag] = t
        print(f"{tag}: {t*1e3:7.2f} ms  {nb/t:6.1f} GB/s")

    best120 = min((t for k, t in results.items() if k.startswith("120")),
                  default=None)
    best201 = min((t for k, t in results.items() if k.startswith("201")),
                  default=None)
    if best120 and best201:
        print(f"implied roundtrip (2x best120 + 2x best201): "
              f"{2e3*(best120+best201):.2f} ms")

    # reference: current 2D-view kernel round trip
    from cudecomp_tpu.ops.pallas_kernels import pallas_cyclic_permute

    def rt2(a):
        a = pallas_cyclic_permute(a, (1, 2, 0))
        a = pallas_cyclic_permute(a, (1, 2, 0))
        a = pallas_cyclic_permute(a, (2, 0, 1))
        return pallas_cyclic_permute(a, (2, 0, 1))

    t = timeit(rt2, x)
    print(f"chained 2D-view kernel roundtrip: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
