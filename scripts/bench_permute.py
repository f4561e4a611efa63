"""Compare XLA vs Pallas local permutes on the chip (forced completion).

The transpose engine's single-chip hot op is the cyclic 3D permutation.
    python scripts/bench_permute.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=64, trials=3):
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


def main(N=256):
    from cudecomp_tpu.ops.pallas_kernels import pallas_transpose2d
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
    nbytes = 2 * x.size * 4

    # (1,2,0) cyclic permute == 2D transpose of (N, N*N); shape-preserving
    # for a cube so it chains under scan
    t_xla = timeit(lambda v: jnp.transpose(v, (1, 2, 0)), x)
    print(f"XLA    permute (1,2,0) {N}^3 f32: {t_xla*1e3:7.3f} ms  "
          f"{nbytes/t_xla/1e9:6.0f} GB/s", flush=True)
    for tm, tn in ((256, 256), (512, 512), (128, 512), (512, 128),
                   (8, 1024), (8, 4096)):
        def pfn(v, a=tm, b=tn):
            return pallas_transpose2d(v.reshape(N, N * N), tm=a,
                                      tn=b).reshape(N, N, N)
        t_p = timeit(pfn, x)
        print(f"pallas tm={tm:4d} tn={tn:4d}:        {t_p*1e3:7.3f} ms  "
              f"{nbytes/t_p/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
