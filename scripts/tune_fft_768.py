"""Factorization sweep for N=768 (the largest compilable cubic size).

The default near-sqrt split (32x24) measured 247 GFLOPS — pass-count
bound with tiny-K matmuls.  Candidates with fewer/fatter stages:

  * dense K=768 (DIRECT_THRESHOLD=768): ONE matmul stage per axis
  * 384x2 / 192x4: radix-2/4 VPU butterfly + one dense K<=384 stage
  * 256x3: K=3 matmul + dense K=256

    python scripts/tune_fft_768.py
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

N = 768


def run_case(tag, policy, env, iters=4, n_trials=3):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu.ops.fft import DistributedFFT

    os.environ["CUDECOMP_TPU_FFT_PRECISION"] = policy
    for k, v in env.items():
        os.environ[k] = v

    try:
        cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1))
        grid = cd.make_grid(cfg, devices=jax.devices()[:1])
        plan = DistributedFFT(grid=grid, split_complex=True)
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0),
                              grid.global_shape(0) + (2,), jnp.float32),
            grid.sharding(0))

        def cycle(v):
            return plan.inverse(plan.forward(v))

        @jax.jit
        def gate(v):
            return jnp.max(jnp.abs(cycle(v) - v))

        err = float(gate(x))

        @jax.jit
        def run(v):
            out, _ = lax.scan(lambda c, _: (cycle(c), ()), v, None,
                              length=iters)
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
        g = "PASS" if err < 5e-4 else "FAIL"
        print(f"{tag:28s} {policy:8s} err {err:.2e} [{g}]  "
              f"{t*1e3:8.2f} ms/dir  {gflops:7.1f} GFLOPS", flush=True)
    except Exception as e:
        print(f"{tag:28s} {policy:8s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    cases = [
        ("default 32x24", "highest", {}),
        ("dense K=768", "highest",
         {"CUDECOMP_TPU_FFT_DIRECT_THRESHOLD": "768"}),
        ("dense K=768", "high",
         {"CUDECOMP_TPU_FFT_DIRECT_THRESHOLD": "768"}),
        ("384x2 (radix-2 + dense)", "highest",
         {"CUDECOMP_TPU_FFT_FACTORS": "768=384x2"}),
        ("384x2 (radix-2 + dense)", "high",
         {"CUDECOMP_TPU_FFT_FACTORS": "768=384x2"}),
        ("192x4 (radix-4 + dense)", "high",
         {"CUDECOMP_TPU_FFT_FACTORS": "768=192x4"}),
        ("256x3 (K=3 + dense)", "high",
         {"CUDECOMP_TPU_FFT_FACTORS": "768=256x3"}),
    ]
    for tag, policy, env in cases:
        run_case(tag, policy, env)
    os.environ.pop("CUDECOMP_TPU_FFT_PRECISION", None)


if __name__ == "__main__":
    main()
