"""FFT precision-policy calibration at large N (VERDICT r2 item 4).

Measures, per (N, policy) case: one-round-trip max error vs the reference
5e-4 single-precision gate (benchmark.cu:23-27) and GFLOPS
(5 N^3 log2(N^3) / t, one direction).  Cases:

  * the HIGH-margin question: does bf16x3 stay inside the gate past 512?
    (dense DFT K=N through 512; four-step 32x32-style splits above)
  * bf16 inter-stage carry (CUDECOMP_TPU_FFT_BF16_CARRY): the one untried
    HBM lever in the HBM-bound HIGH regime — measure speed AND error
  * the largest N that fits on one chip (1024^3 attempted, OOM recorded)

    python scripts/tune_fft_policy.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def run_case(N, policy, bf16=False, real=False, iters=None, n_trials=3,
             direct_threshold=None):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu.ops.fft import DistributedFFT

    os.environ["CUDECOMP_TPU_FFT_PRECISION"] = policy
    os.environ["CUDECOMP_TPU_FFT_BF16_CARRY"] = "1" if bf16 else "0"
    # pin the factorization path so case labels stay truthful regardless
    # of the library default (raised to 1024 after this script's r3 run)
    os.environ["CUDECOMP_TPU_FFT_DIRECT_THRESHOLD"] = str(
        direct_threshold if direct_threshold is not None else 512)
    if iters is None:
        iters = 8 if N <= 512 else 4

    cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1))
    grid = cd.make_grid(cfg, devices=jax.devices()[:1])
    plan = DistributedFFT(grid=grid, split_complex=True, real=real)
    shape = grid.global_shape(0) + (() if real else (2,))
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
        grid.sharding(0))

    def cycle(v):
        return plan.inverse(plan.forward(v))

    @jax.jit
    def gate(v):
        return jnp.max(jnp.abs(cycle(v) - v))

    err = float(gate(x))

    @jax.jit
    def run(v):
        out, _ = lax.scan(lambda c, _: (cycle(c), ()), v, None, length=iters)
        return jnp.max(jnp.abs(out))

    float(run(x))
    float(run(x))
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters / 2.0)
    t = min(ts)
    gflops = 5.0 * N ** 3 * math.log2(N ** 3) / t / 1e9
    tag = (f"{N}^3 {'r2c' if real else 'c2c'} {policy}"
           f"{'+bf16carry' if bf16 else ''}")
    gatestr = "PASS" if err < 5e-4 else "FAIL"
    print(f"{tag:32s} err {err:.2e} [{gatestr}]  {t*1e3:8.2f} ms/dir  "
          f"{gflops:7.1f} GFLOPS", flush=True)


def main():
    cases = [
        (512, "highest", {}),
        (512, "high", {}),
        (512, "high", {"bf16": True}),
        (768, "highest", {}),       # four-step territory (768 = 32 x 24)
        (768, "high", {}),
        (768, "high", {"bf16": True}),
        (1024, "high", {}),         # four-step 32 x 32 (threshold 512)
        (1024, "highest", {}),
        (1024, "high", {"real": True}),
        (1024, "high", {"direct_threshold": 1024}),  # dense K=1024
    ]
    for N, policy, kw in cases:
        try:
            run_case(N, policy, **kw)
        except Exception as e:
            print(f"{N}^3 {policy} {kw}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:140]}",
                  flush=True)
    for var in ("CUDECOMP_TPU_FFT_PRECISION", "CUDECOMP_TPU_FFT_BF16_CARRY",
                "CUDECOMP_TPU_FFT_DIRECT_THRESHOLD"):
        os.environ.pop(var, None)


if __name__ == "__main__":
    main()
