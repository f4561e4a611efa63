"""Large-N Pallas cyclic-permute tile sweep (768^3 / 1024^3 eligibility).

The r4 tile planner (_plan_tiles) grows tiles to keep the Mosaic block
count under the remote-compiler grid cap; this script measures the actual
candidates on the chip so the planner's preference order is data, not
guesswork.  Forced-completion scanned timing (BENCH_NOTES.md methodology).

HYGIENE: running any 768^3 workload poisons the tunnel server's
512^3-r2c-shaped programs until server restart — run r2c benchmarks BEFORE
this script in the session (see scripts/retry_corruption.py).

    python scripts/tune_permute_tiles.py [N] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=32, trials=3):
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


def main(N=768, iters=32):
    from cudecomp_tpu.ops.pallas_kernels import (_plan_tiles,
                                                 pallas_transpose2d)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
    nbytes = 2 * x.size * 4

    for perm in ((1, 2, 0), (2, 0, 1)):
        M, Nc = (N, N * N) if perm == (1, 2, 0) else (N * N, N)
        print(f"== perm {perm}: 2D view ({M}, {Nc}); planner pick "
              f"{_plan_tiles(M, Nc)}", flush=True)
        t_xla = timeit(lambda v: jnp.transpose(v, perm), x, iters)
        print(f"  XLA permute: {t_xla*1e3:7.3f} ms  "
              f"{nbytes/t_xla/1e9:6.0f} GB/s", flush=True)
        if perm == (1, 2, 0):
            cands = [(384, 1152), (768, 768), (384, 2304), (768, 1152),
                     (256, 1152), (768, 2304)]
            if N == 1024:
                cands = [(1024, 1024), (512, 2048), (256, 4096),
                         (1024, 2048), (512, 4096)]
        else:
            cands = [(b, a) for a, b in
                     ([(384, 1152), (768, 768), (384, 2304), (768, 1152)]
                      if N == 768 else
                      [(1024, 1024), (512, 2048), (1024, 2048)])]
        ref = None
        for tm, tn in cands:
            if M % tm or Nc % tn:
                continue
            blocks = (M // tm) * (Nc // tn)

            def pfn(v, a=tm, b=tn):
                out_shape = tuple(np.array(v.shape)[list(perm)])
                return pallas_transpose2d(
                    v.reshape(M, Nc), tm=a, tn=b).reshape(out_shape)

            try:
                # correctness once (vs XLA), then timing
                if ref is None:
                    ref = jax.jit(lambda v: jnp.transpose(v, perm))(x)
                err = float(jax.jit(
                    lambda v: jnp.max(jnp.abs(pfn(v) - ref)))(x))
                # pfn maps cube -> permuted cube, shape-preserving: scans
                t_p = timeit(pfn, x, iters)
                print(f"  pallas ({tm:4d},{tn:4d}) {blocks:5d} blk "
                      f"{tm*tn*4/1e6:5.1f}MB: {t_p*1e3:7.3f} ms  "
                      f"{nbytes/t_p/1e9:6.0f} GB/s  err={err:g}",
                      flush=True)
            except Exception as e:
                print(f"  pallas ({tm:4d},{tn:4d}) {blocks:5d} blk: "
                      f"FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 768,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32)
