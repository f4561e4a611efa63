"""Axis-0 DFT contraction forms at 512^3 (the conv-lowering question).

The r3 device trace showed the in-place axis-0 einsum "abc,aA->Abc" lowers
as an XLA *convolution* at 64% of the bf16x3 floor while the dot-form axes
run at 73%.  A C-order (a, b, c) -> (a, b*c) reshape is metadata-only, so
the same contraction can be fed to XLA as a plain 2D dot ("ab,aA->Ab").
This measures both forms (plus the Gauss 3-matmul production shape) at the
512-shape, HIGH and HIGHEST precision.

    python scripts/tune_axis0_dot.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, args, iters=8, trials=3):
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), ()
        out, _ = lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o) for o in out)

    float(run(args))
    float(run(args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main(N=512):
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) / N)
    s = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) / N)
    xr = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))

    # Gauss complex contraction (the production shape): 3 real matmuls
    def gauss(eq, r, i, prec):
        dot = lambda x, m: jnp.einsum(eq, x, m, precision=prec)
        k1 = dot(r + i, c)
        k2 = dot(r, s - c)
        k3 = dot(i, c + s)
        return (k1 - k3, k1 + k2)

    def axis0_inplace(r, i, prec):
        return gauss("abc,aA->Abc", r, i, prec)

    def axis0_flat(r, i, prec):
        shp = r.shape
        flat = (shp[0], shp[1] * shp[2])
        rr, ii = gauss("ab,aA->Ab", r.reshape(flat), i.reshape(flat), prec)
        return rr.reshape(shp), ii.reshape(shp)

    # reference axis-2 (dot-form champion in the r3 trace)
    def axis2_inplace(r, i, prec):
        dot = lambda x, m: jnp.einsum("abc,cC->abC", x, m, precision=prec)
        k1 = dot(r + i, c)
        k2 = dot(r, s - c)
        k3 = dot(i, c + s)
        return (k1 - k3, k1 + k2)

    # 3 matmuls * 2 N^3*N macs (bf16x3 issues 3 passes at HIGH; report raw)
    flops = 3 * 2 * N ** 4
    variants = [("axis0 in-place einsum (conv-lowered?)", axis0_inplace),
                ("axis0 flat 2D dot", axis0_flat),
                ("axis2 in-place (dot-form ref)", axis2_inplace)]
    precs = [lax.Precision.HIGH]
    if os.environ.get("AXIS0_BOTH_PRECS", "0") == "1":
        precs.append(lax.Precision.HIGHEST)
    for prec in precs:
        for name, fn in variants:
            f = lambda r, i, fn=fn, p=prec: fn(r, i, p)
            # correctness cross-check once per pair
            t = timeit(f, (xr, xi))
            print(f"prec={str(prec):10s} {name:38s}: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:5.2f} TF-equiv", flush=True)
        ra, ia = jax.jit(lambda r, i: axis0_inplace(r, i, prec))(xr, xi)
        rb, ib = jax.jit(lambda r, i: axis0_flat(r, i, prec))(xr, xi)
        err = float(jnp.max(jnp.abs(ra - rb)) + jnp.max(jnp.abs(ia - ib)))
        print(f"  flat-vs-inplace max err: {err:g}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
