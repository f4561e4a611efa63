"""Measure ONE cyclic-permute implementation at N^3 (minimal chip time).

    python scripts/tune_permute_tile_one.py N perm tm tn [iters]
    python scripts/tune_permute_tile_one.py N perm xla  [iters]

perm: 120 for (1,2,0), 201 for (2,0,1).  Correctness (vs jnp.transpose)
and scanned timing share one process; each invocation compiles exactly two
programs (err gate, timed scan).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main(N, perm, impl, iters=16):
    from cudecomp_tpu.ops.pallas_kernels import pallas_transpose2d
    t_start = time.perf_counter()
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
    nbytes = 2 * x.size * 4
    M, Nc = (N, N * N) if perm == (1, 2, 0) else (N * N, N)

    if impl == "xla":
        pfn = lambda v: jnp.transpose(v, perm)
    else:
        tm, tn = impl

        def pfn(v):
            out_shape = tuple(np.array(v.shape)[list(perm)])
            return pallas_transpose2d(v.reshape(M, Nc), tm=tm,
                                      tn=tn).reshape(out_shape)

    if impl != "xla":
        err = float(jax.jit(lambda v: jnp.max(jnp.abs(
            pfn(v) - jnp.transpose(v, perm))))(x))
        print(f"err={err:g}  (compile+gate {time.perf_counter()-t_start:.0f}s)",
              flush=True)

    @jax.jit
    def run(v):
        def body(c, _):
            return pfn(c), ()
        out, _ = lax.scan(body, v, None, length=iters)
        return jnp.sum(out)

    float(run(x))
    float(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    t = min(ts)
    tag = "xla" if impl == "xla" else f"pallas({impl[0]},{impl[1]})"
    blocks = "" if impl == "xla" else \
        f" {(M // impl[0]) * (Nc // impl[1])} blk"
    print(f"{N}^3 perm{perm} {tag}{blocks}: {t*1e3:.3f} ms  "
          f"{nbytes/t/1e9:.0f} GB/s  (total {time.perf_counter()-t_start:.0f}s)",
          flush=True)


if __name__ == "__main__":
    N = int(sys.argv[1])
    perm = (1, 2, 0) if sys.argv[2] == "120" else (2, 0, 1)
    if sys.argv[3] == "xla":
        impl = "xla"
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    else:
        impl = (int(sys.argv[3]), int(sys.argv[4]))
        iters = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    main(N, perm, impl, iters)
