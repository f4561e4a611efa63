"""Large-N 1D FFT policy exploration (N > dense threshold).

Times fft_split over the last axis for N in {1024, 2048} across four-step
factor choices, to pick defaults for multi-chip 1024^3+ work where per-chip
pencil axes stay long.

    python scripts/tune_large_n.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=16, trials=3):
    @jax.jit
    def run(v):
        def body(c, _):
            return fn(c), ()
        out, _ = lax.scan(body, v, None, length=iters)
        return jnp.sum(out[..., :1])

    float(run(x)); float(run(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    from cudecomp_tpu.ops import mxu_fft as M

    for n, batch in ((1024, 64 * 256), (2048, 32 * 256)):
        # generate on device: large host->device transfers hit
        # UNIMPLEMENTED on this tunnel runtime
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, n, 2),
                              jnp.float32)
        nominal = 5.0 * batch * n * np.log2(n)
        for factors in (None, f"{n}=128x{n // 128}", f"{n}={n // 128}x128",
                        f"{n}=256x{n // 256}"):
            if factors:
                os.environ["CUDECOMP_TPU_FFT_FACTORS"] = factors
            else:
                os.environ.pop("CUDECOMP_TPU_FFT_FACTORS", None)
            try:
                t = timeit(lambda v: M.fft_split(v, axis=1), x)
                # correctness spot-check (combine to complex on HOST: the
                # axon runtime has no complex dtypes)
                gs = np.asarray(jax.device_get(jax.jit(
                    lambda v: M.fft_split(v, axis=1))(x[:4])))
                hs = np.asarray(jax.device_get(x[:4]))
                got = gs[..., 0] + 1j * gs[..., 1]
                want = np.fft.fft(hs[..., 0] + 1j * hs[..., 1], axis=1)
                err = np.max(np.abs(got - want)) / np.max(np.abs(want))
                print(f"N={n} factors={factors or 'default':14s}: "
                      f"{t*1e3:7.3f} ms  {nominal/t/1e9:6.1f} GFLOPS  "
                      f"err {err:.1e}", flush=True)
            except Exception as e:
                print(f"N={n} factors={factors}: FAILED {str(e)[:120]}",
                      flush=True)
    os.environ.pop("CUDECOMP_TPU_FFT_FACTORS", None)


if __name__ == "__main__":
    main()
