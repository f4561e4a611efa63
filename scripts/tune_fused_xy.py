"""Prototype: fused 2-axis dense-DFT Pallas kernel (one HBM pass, two axes).

The in-place einsum FFT is HBM-bound at HIGH precision: each axis
contraction makes a full read+write pass over the field.  For the natural
layout, the Y and Z contractions of one x-block touch only that block, so a
Pallas kernel can do both while the block sits in VMEM — halving HBM
traffic for two of the three stages of a 3D FFT (or a 2D slab stage).
Block geometry (Bx, N, N): the trailing two dims are full, satisfying the
Mosaic (8, 128) block divisibility rule.

    python scripts/tune_fused_xy.py [N]
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


def timeit(fn, args, iters=48, trials=3):
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


def _fused_kernel(xr_ref, xi_ref, cr_ref, ci_ref, or_ref, oi_ref, *, prec):
    xr = xr_ref[...]
    xi = xi_ref[...]
    cr = cr_ref[...]
    ci = ci_ref[...]
    dot = functools.partial(jnp.einsum, precision=prec,
                            preferred_element_type=jnp.float32)

    def cmul(eq, ar, ai):
        k1 = dot(eq, ar + ai, cr)
        k2 = dot(eq, ar, ci - cr)
        k3 = dot(eq, ai, cr + ci)
        return k1 - k3, k1 + k2

    # Y-DFT in place (contract dim 1 of (Bx, N, N))
    yr, yi = cmul("byc,yY->bYc", xr, xi)
    # Z-DFT in place (contract dim 2)
    zr, zi = cmul("byc,cC->byC", yr, yi)
    or_ref[...] = zr
    oi_ref[...] = zi


def fused_yz(xr, xi, cr, ci, bx, prec):
    X, Y, Z = xr.shape
    grid = (X // bx,)
    return pl.pallas_call(
        functools.partial(_fused_kernel, prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bx, Y, Z), lambda k: (k, 0, 0)),
            pl.BlockSpec((bx, Y, Z), lambda k: (k, 0, 0)),
            pl.BlockSpec((Y, Y), lambda k: (0, 0)),
            pl.BlockSpec((Y, Y), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bx, Y, Z), lambda k: (k, 0, 0)),
            pl.BlockSpec((bx, Y, Z), lambda k: (k, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct(xr.shape, xr.dtype)] * 2,
    )(xr, xi, cr, ci)


def main(N=256):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    k = np.arange(N)
    ang = 2 * np.pi * np.outer(k, k) / N
    cr = jnp.asarray(np.cos(ang).astype(np.float32))
    ci = jnp.asarray(-np.sin(ang).astype(np.float32))
    import os
    prec = (lax.Precision.HIGHEST if os.environ.get('FUSED_PREC', 'highest') == 'highest'
            else lax.Precision.HIGH)

    # reference: two chained XLA einsums (current production path)
    def xla_two(ar, ai):
        def cmul(eq, r, i):
            k1 = jnp.einsum(eq, r + i, cr, precision=prec)
            k2 = jnp.einsum(eq, r, ci - cr, precision=prec)
            k3 = jnp.einsum(eq, i, cr + ci, precision=prec)
            return k1 - k3, k1 + k2
        yr, yi = cmul("byc,yY->bYc", ar, ai)
        return cmul("byc,cC->byC", yr, yi)

    t = timeit(lambda a, b: xla_two(a, b), (xr, xi))
    print(f"XLA 2-stage einsum YZ:        {t*1e3:7.3f} ms", flush=True)
    want_r, want_i = jax.jit(xla_two)(xr, xi)

    for bx in (4, 8, 16):
        try:
            fn = lambda a, b, bx=bx: tuple(fused_yz(a, b, cr, ci, bx, prec))
            got_r, got_i = jax.jit(fn)(xr, xi)
            err = float(jnp.max(jnp.abs(got_r - want_r))
                        + jnp.max(jnp.abs(got_i - want_i)))
            t = timeit(fn, (xr, xi))
            print(f"pallas fused YZ bx={bx:3d}:      {t*1e3:7.3f} ms   "
                  f"err {err:.2e}", flush=True)
        except Exception as e:
            print(f"pallas fused YZ bx={bx:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
