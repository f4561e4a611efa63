"""Micro-benchmark: MXU FFT factorization policy on real TPU hardware.

Compares direct dense DFT vs four-step factorizations for the transform
sizes that matter (256..2048), at 3D-grid-scale batch sizes.  Results feed
the factorization policy in cudecomp_tpu/ops/mxu_fft.py.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudecomp_tpu.ops import mxu_fft as M


def time_call(fn, x, iters=8):
    # chain iterations (each depends on the previous output) so no caching,
    # CSE, or dispatch pipelining can elide work
    @jax.jit
    def chained(v):
        for _ in range(iters):
            v = fn(v)
        return v

    jax.block_until_ready(chained(x))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def bench(n, batch, policy):
    """policy: ('direct',) or ('four', A, B)"""
    orig_factor = M._best_factorization
    orig_thresh = M.DIRECT_THRESHOLD
    try:
        if policy[0] == "direct":
            M.DIRECT_THRESHOLD = n
        else:
            M.DIRECT_THRESHOLD = min(64, n - 1)
            _, A, B = policy
            M._best_factorization = lambda m, _A=A, _B=B, _n=n, _o=orig_factor: \
                (_A, _B) if m == _n else _o(m)
        x = jnp.ones((batch, n, 2), jnp.float32)
        fn = jax.jit(lambda v: M.fft_split(v, axis=1))
        t = time_call(fn, x)
        flops_nominal = 5 * batch * n * math.log2(n)
        return t, flops_nominal / t / 1e9
    finally:
        M._best_factorization = orig_factor
        M.DIRECT_THRESHOLD = orig_thresh


def factor_pairs(n):
    out = []
    for b in range(2, int(math.isqrt(n)) + 1):
        if n % b == 0:
            out.append((n // b, b))
    # include large-B variants
    for b in (128, 256, 512):
        if n % b == 0 and n // b > 1:
            out.append((n // b, b))
    return sorted(set(out))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for n in (256, 512, 1024, 2048):
        batch = (256 * 256 * 256) // n  # constant total elements
        cands = [("direct",)] if n <= 1024 else []
        for a, b in factor_pairs(n):
            if max(a, b) <= 512 and min(a, b) >= 4:
                cands.append(("four", a, b))
        for pol in cands:
            try:
                t, gf = bench(n, batch, pol)
                print(f"n={n:5d} batch={batch:7d} {str(pol):20s} "
                      f"{t*1e3:8.3f} ms  {gf:8.1f} eff-GFLOPS", flush=True)
            except Exception as e:
                print(f"n={n:5d} {pol} FAILED: {str(e)[:60]}", flush=True)
