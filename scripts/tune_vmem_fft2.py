"""In-VMEM 1D FFT kernel v2 (8x128 factorization + in-kernel swap).

Isolates the remaining Mosaic failure: big-batch grid vs lax.scan wrapping.

    python scripts/tune_vmem_fft2.py
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

N = 1024
A, B = 128, 8
bb = 128

ang = 2 * np.pi * np.outer(np.arange(B), np.arange(B)) / B
cbr, cbi = np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)
ang = 2 * np.pi * np.outer(np.arange(B), np.arange(A)) / N
twr, twi = np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)
ang = 2 * np.pi * np.outer(np.arange(A), np.arange(A)) / A
car, cai = np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)
CONSTS = [jnp.asarray(m) for m in (cbr, cbi, twr, twi, car, cai)]
SHAPES = [(B, B), (B, B), (B, A), (B, A), (A, A), (A, A)]


def kern(xr_ref, xi_ref, cbr_ref, cbi_ref, twr_ref, twi_ref, car_ref,
         cai_ref, or_ref, oi_ref):
    dot = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)

    def cmul(eq, ar, ai, mr, mi):
        k1 = dot(eq, ar + ai, mr)
        k2 = dot(eq, ar, mi - mr)
        k3 = dot(eq, ai, mr + mi)
        return k1 - k3, k1 + k2

    yr, yi = cmul("bxy,xX->bXy", xr_ref[...], xi_ref[...], cbr_ref[...],
                  cbi_ref[...])
    zr = yr * twr_ref[...] - yi * twi_ref[...]
    zi = yr * twi_ref[...] + yi * twr_ref[...]
    outr, outi = cmul("bky,yY->bkY", zr, zi, car_ref[...], cai_ref[...])
    or_ref[...] = jnp.swapaxes(outr, 1, 2)
    oi_ref[...] = jnp.swapaxes(outi, 1, 2)


def vmem(a, b):
    batch = a.shape[0]
    a3, b3 = a.reshape(batch, B, A), b.reshape(batch, B, A)
    bspec = pl.BlockSpec((bb, B, A), lambda k: (k, 0, 0))
    ospec = pl.BlockSpec((bb, A, B), lambda k: (k, 0, 0))
    o_r, o_i = pl.pallas_call(
        kern, grid=(batch // bb,),
        in_specs=[bspec, bspec] + [pl.BlockSpec(s, lambda k: (0, 0))
                                   for s in SHAPES],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((batch, A, B), jnp.float32)] * 2,
    )(a3, b3, *CONSTS)
    return o_r.reshape(batch, N), o_i.reshape(batch, N)


def timeit_scan(fn, args, iters=32, trials=3):
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), ()
        out, _ = lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o[..., :1]) for o in out)

    float(run(args))
    float(run(args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    for batch, use_scan in ((512, False), (16384, False), (512, True),
                            (16384, True)):
        xr = jax.random.normal(jax.random.PRNGKey(1), (batch, N), jnp.float32)
        xi = jax.random.normal(jax.random.PRNGKey(2), (batch, N), jnp.float32)
        try:
            if use_scan:
                t = timeit_scan(vmem, (xr, xi))
                nominal = 5.0 * batch * N * math.log2(N)
                print(f"batch={batch:6d} scan=True : {t*1e3:7.3f} ms  "
                      f"{nominal/t/1e9:6.1f} GFLOPS", flush=True)
            else:
                gr, gi = jax.jit(vmem)(xr, xi)
                h = (np.asarray(jax.device_get(gr[:2]))
                     + 1j * np.asarray(jax.device_get(gi[:2])))
                xh = (np.asarray(jax.device_get(xr[:2]))
                      + 1j * np.asarray(jax.device_get(xi[:2])))
                want = np.fft.fft(xh, axis=1)
                err = np.max(np.abs(h - want)) / np.max(np.abs(want))
                print(f"batch={batch:6d} scan=False: OK err {err:.2e}",
                      flush=True)
        except Exception as e:
            print(f"batch={batch:6d} scan={use_scan}: FAIL "
                  f"{str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
