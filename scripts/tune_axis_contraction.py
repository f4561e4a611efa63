"""Per-axis DFT contraction microbenchmark (forced completion).

Times one split-complex dense-DFT contraction (4 real matmuls) for each axis
position of a 256^3 field, plus precision and formulation variants, to find
where the end-to-end FFT time goes.

    python scripts/tune_axis_contraction.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, args, iters=4, trials=3):
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), ()
        out, _ = lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o[..., :2]) for o in out)

    float(run(args))
    float(run(args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main(N=256):
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    xr = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))

    eqs = {0: "abc,aA->Abc", 1: "abc,bB->aBc", 2: "abc,cC->abC"}
    flops_bf16 = 4 * 2 * N**4  # 4 real matmuls
    for prec in (lax.Precision.HIGHEST, lax.Precision.HIGH):
        for ax, eq in eqs.items():
            def fn(r, i, eq=eq, p=prec):
                rr = jnp.einsum(eq, r, c, precision=p) - jnp.einsum(
                    eq, i, s, precision=p)
                ii = jnp.einsum(eq, r, s, precision=p) + jnp.einsum(
                    eq, i, c, precision=p)
                return rr, ii
            t = timeit(fn, (xr, xi))
            print(f"prec={str(prec):18s} axis={ax}: {t*1e3:7.3f} ms "
                  f"({flops_bf16/t/1e12:5.1f} eff bf16-TF 1pass-equiv)",
                  flush=True)

    # joint 2N-matmul formulation for the minor axis: x (..., N, 2) viewed as
    # (..., 2N) times the (2N, 2N) real block matrix [[C, S], [-S, C]]
    M = np.zeros((N, 2, N, 2), np.float32)
    Mr = np.asarray(c)
    Mi = np.asarray(s)
    M[:, 0, :, 0] = Mr
    M[:, 0, :, 1] = Mi
    M[:, 1, :, 0] = -Mi
    M[:, 1, :, 1] = Mr
    M2 = jnp.asarray(M.reshape(2 * N, 2 * N))
    xs = jnp.stack([xr, xi], axis=-1).reshape(N, N, 2 * N)
    for prec in (lax.Precision.HIGHEST, lax.Precision.HIGH):
        def fn2(v, p=prec):
            return (jnp.einsum("abc,cC->abC", v, M2, precision=p),)
        t = timeit(fn2, (xs,))
        print(f"joint 2N matmul minor axis prec={str(prec):8s}: {t*1e3:7.3f} ms",
              flush=True)

    # pure matmul calibration: (N*N, N) @ (N, N)
    flat = xr.reshape(N * N, N)
    for prec in (lax.Precision.HIGHEST, lax.Precision.HIGH,
                 lax.Precision.DEFAULT):
        def fnm(v, p=prec):
            return (jnp.dot(v, c, precision=p),)
        t = timeit(fnm, (flat,))
        tf = 2 * N**4 / t / 1e12
        print(f"single matmul ({N*N}x{N})@({N}x{N}) prec={str(prec):8s}: "
              f"{t*1e3:7.3f} ms  {tf:5.1f} TF", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
