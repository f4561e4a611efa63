"""Prototype: in-VMEM multi-stage 1D FFT Pallas kernel for large N.

The large-N four-step path is pass-count-bound (~5x above its compute
bound): split, two contractions, twiddle, and flatten each make HBM
round trips.  This kernel loads a (Bb, N) batch tile into VMEM ONCE,
performs all four-step stages in VMEM (two K=sqrt(N) matmuls + twiddle),
and writes once — a single HBM pass per axis.

    python scripts/tune_vmem_fft.py [N]
"""

import functools
import math
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


def timeit(fn, args, iters=32, trials=3):
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), ()
        out, _ = lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o[..., :1]) for o in out)

    float(run(args)); float(run(args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def _kernel(xr_ref, xi_ref, cbr_ref, cbi_ref, twr_ref, twi_ref,
            car_ref, cai_ref, or_ref, oi_ref, *, A, B, prec):
    vr = xr_ref[...]
    vi = xi_ref[...]
    dot = functools.partial(jnp.einsum, precision=prec,
                            preferred_element_type=jnp.float32)

    def cmul(eq, ar, ai, mr, mi):
        k1 = dot(eq, ar + ai, mr)
        k2 = dot(eq, ar, mi - mr)
        k3 = dot(eq, ai, mr + mi)
        return k1 - k3, k1 + k2

    # step 1: B-point DFTs over dim 1 -> y[b, k2, a]
    yr, yi = cmul("bxy,xX->bXy", vr, vi, cbr_ref[...], cbi_ref[...])
    # step 2: twiddle W_N^{a k2}, laid out (k2, a)
    twr = twr_ref[...]
    twi = twi_ref[...]
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # step 3: A-point DFTs over dim 2, k1 written to dim 1 -> out[b, k1, k2]
    outr, outi = cmul("bky,yY->bYk", zr, zi, car_ref[...], cai_ref[...])
    or_ref[...] = outr
    oi_ref[...] = outi


def vmem_fft(xr, xi, A, B, bb, prec):
    n = A * B
    batch = xr.shape[0]
    ang = 2 * np.pi * np.outer(np.arange(B), np.arange(B)) / B
    cbr, cbi = np.cos(ang), -np.sin(ang)
    ang = 2 * np.pi * np.outer(np.arange(B), np.arange(A)) / n
    twr, twi = np.cos(ang), -np.sin(ang)
    ang = 2 * np.pi * np.outer(np.arange(A), np.arange(A)) / A
    car, cai = np.cos(ang), -np.sin(ang)
    consts = [jnp.asarray(m.astype(np.float32))
              for m in (cbr, cbi, twr, twi, car, cai)]
    shapes = [(B, B), (B, B), (B, A), (B, A), (A, A), (A, A)]

    # 3D views outside the kernel: XLA reshapes are metadata-only, and the
    # kernel then sees native (bb, B, A) blocks (no in-kernel relayout)
    xr3 = xr.reshape(batch, B, A)
    xi3 = xi.reshape(batch, B, A)
    bspec = pl.BlockSpec((bb, B, A), lambda k: (k, 0, 0))
    ospec = pl.BlockSpec((bb, A, B), lambda k: (k, 0, 0))
    outr, outi = pl.pallas_call(
        functools.partial(_kernel, A=A, B=B, prec=prec),
        grid=(batch // bb,),
        in_specs=[bspec, bspec] + [pl.BlockSpec(s, lambda k: (0, 0))
                                   for s in shapes],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((batch, A, B), xr.dtype)] * 2,
    )(xr3, xi3, *consts)
    return outr.reshape(batch, n), outi.reshape(batch, n)


def main(N=1024):
    batch = (64 * 256 * 1024) // N
    xr = jax.random.normal(jax.random.PRNGKey(0), (batch, N), jnp.float32)
    xi = jax.random.normal(jax.random.PRNGKey(1), (batch, N), jnp.float32)
    nominal = 5.0 * batch * N * math.log2(N)

    from cudecomp_tpu.ops import mxu_fft as M
    xs = jnp.stack([xr, xi], axis=-1)
    t = timeit(lambda v: (M.fft_split(v, axis=1),), (xs,))
    print(f"current fft_split N={N}:    {t*1e3:7.3f} ms  "
          f"{nominal/t/1e9:6.1f} GFLOPS", flush=True)
    want = np.asarray(jax.device_get(jax.jit(
        lambda v: M.fft_split(v, axis=1))(xs[:4])))

    # lane-dim alignment: A = 128 keeps every in-kernel operand's minor
    # dim at the MXU lane width (sqrt factors gave 32-lane tiles, which
    # Mosaic's matmul path rejected with an internal error)
    A = 128
    B = N // A
    for prec in (lax.Precision.HIGHEST,):
        for bb in (128, 256, 512):
            if batch % bb:
                continue
            try:
                fn = lambda a, b, bb=bb, p=prec: tuple(
                    vmem_fft(a, b, A, B, bb, p))
                got_r, got_i = jax.jit(fn)(xr[:bb], xi[:bb])
                gw = want[:4]
                err = (float(jnp.max(jnp.abs(got_r[:4] - gw[..., 0])))
                       + float(jnp.max(jnp.abs(got_i[:4] - gw[..., 1]))))
                t = timeit(fn, (xr, xi))
                print(f"vmem fft {A}x{B} bb={bb:4d}:  {t*1e3:7.3f} ms  "
                      f"{nominal/t/1e9:6.1f} GFLOPS  err {err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"vmem fft bb={bb}: FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
