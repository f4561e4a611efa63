"""Benchmark-as-test (reference benchmark_base_test analog): the bench
pipeline at tiny size on the CPU mesh, with the correctness gate."""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.ops.fft import DistributedFFT


def test_bench_pipeline_smoke():
    N, ITERS = 16, 2
    cfg = GridConfig(gdims=(N, N, N), pdims=(2, 2),
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    plan = DistributedFFT(grid=grid, split_complex=True)

    def cycle(x, _):
        return plan.inverse(plan.forward(x)), ()

    @jax.jit
    def run(x):
        out, _ = lax.scan(cycle, x, None, length=ITERS)
        return jnp.max(jnp.abs(out - x))

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), grid.global_shape(0) + (2,),
                          dtype=jnp.float32), grid.sharding(0))
    err = float(run(x))
    assert err < 5e-4, err


def test_bench_main_runs_on_cpu(capsys):
    import bench
    bench.main(N=16, ITERS=1, n_trials=1)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json
    rec = json.loads(out)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_bench_full_headlines_run_on_cpu():
    import bench_full
    r = bench_full.halo_headline(N=16, width=1, ITERS=1, n_trials=1)
    assert r["value"] > 0
    r = bench_full.stencil_headline(N=16, ITERS=1, n_trials=1)
    assert r["value"] > 0
    r = bench_full.transpose_headline(N=16, n_trials=1, iters=1)
    assert r["value"] > 0
    r = bench_full.cg_headline(N=16, tol=1e-6, maxiter=200)
    assert r["value"] > 0 and r["rel_residual"] < 1e-6


def test_bench_fft_headline_large_runs_on_cpu():
    # the large-FFT headline path (in-jit plane generation + gate + timing)
    # must work off-chip too; tiny grid keeps it fast
    import bench_full
    r = bench_full.fft_headline_large((32, 16, 16), ITERS=2, n_trials=1)
    assert r["value"] and r["value"] > 0
    assert "gate-checked" in r["metric"]
