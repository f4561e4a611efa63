"""FFT size sweep on the chip — the committed performance record.

Measures the plane-carried split-complex c2c round trip at every cubic
size the toolchain compiles (the analog of the reference's committed
sample benchmark CSVs, benchmark/heatmap_scripts/sample/).  Sizes ascend
and 768 runs LAST in the process (benchmark-hygiene rule: the axon
runtime corrupts subsequent programs after 768^3 workloads,
BENCH_NOTES.md r3); every row carries its own in-process gate result.

    python scripts/bench_fft_sizes.py [out.csv]
"""

import csv
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [128, 256, 384, 448, 512, 640, 768]


def bench(N, policy, iters, n_trials=3):
    # jax imports live here: the orchestrating process must stay jax-free
    # (the axon tunnel misbehaves when two processes initialize jax)
    import jax
    import jax.numpy as jnp
    from jax import lax
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu.ops.fft import DistributedFFT

    os.environ["CUDECOMP_TPU_FFT_PRECISION"] = policy
    try:
        cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1))
        grid = cd.make_grid(cfg, devices=jax.devices()[:1])
        plan = DistributedFFT(grid=grid, split_complex=True)
        x = tuple(
            jax.device_put(
                jax.random.normal(jax.random.PRNGKey(k), (N, N, N),
                                  jnp.float32), grid.sharding(0))
            for k in (0, 1))

        def cycle(v):
            return plan.inverse_planes(plan.forward_planes(v))

        def err_of(a, b):
            return jnp.maximum(jnp.max(jnp.abs(a[0] - b[0])),
                               jnp.max(jnp.abs(a[1] - b[1])))

        @jax.jit
        def gate(v):
            return err_of(v, cycle(v))

        err = float(gate(x))

        @jax.jit
        def run(v):
            out, _ = lax.scan(lambda c, _: (cycle(c), ()), v, None,
                              length=iters)
            return err_of(v, out)

        float(run(x))
        float(run(x))
        ts = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            float(run(x))
            ts.append((time.perf_counter() - t0) / iters / 2.0)
        t = min(ts)
        gflops = 5.0 * N ** 3 * math.log2(N ** 3) / t / 1e9
        row = dict(n=N, policy=policy, err=f"{err:.2e}",
                   gate="PASS" if err < 5e-4 else "FAIL",
                   ms_per_dir=round(t * 1e3, 3), gflops=round(gflops, 1))
    except Exception as e:  # compile failures at large N are data too
        row = dict(n=N, policy=policy, err="", gate="COMPILE_FAIL",
                   ms_per_dir="", gflops="",
                   note=f"{type(e).__name__}: {str(e).splitlines()[0][:80]}")
    finally:
        os.environ.pop("CUDECOMP_TPU_FFT_PRECISION", None)
    import json
    print(json.dumps(row), flush=True)
    return row


def main(out="benchmarks/sample/fft_sizes_v5e_1chip.csv"):
    import json
    import subprocess
    keys = ["n", "policy", "err", "gate", "ms_per_dir", "gflops", "note"]
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # resumable: completed (n, policy) rows survive an interrupted sweep
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            done = {(int(r["n"]), r["policy"]) for r in csv.DictReader(f)
                    if r.get("gate") not in ("", "PROC_FAIL")}
    new_file = not done
    with open(out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        if new_file:
            f.truncate(0)
            w.writeheader()
        for N in SIZES:
            # fewer in-jit iters at big sizes keeps trials bounded; RTT
            # bias stays < 2% once iters * t_dir >> 25 ms
            iters = 20 if N <= 512 else 6
            for policy in ("auto", "highest"):
                if (N, policy) in done:
                    continue
                # one fresh jax process per row: the orchestrator stays
                # jax-free (single-tunnel-process rule) and no row can be
                # contaminated by a preceding 768^3 workload (the runtime
                # corruption quirk, BENCH_NOTES.md r3)
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--one", str(N), policy, str(iters)],
                    capture_output=True, text=True, timeout=1800)
                lines = [l for l in p.stdout.splitlines()
                         if l.startswith("{")]
                if not lines:
                    row = dict(n=N, policy=policy, err="", gate="PROC_FAIL",
                               ms_per_dir="", gflops="",
                               note=(p.stdout[-80:] + p.stderr[-80:]
                                     ).replace("\n", " "))
                else:
                    row = json.loads(lines[-1])
                print(row, flush=True)
                w.writerow(row)
                f.flush()
    print("wrote", out)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        bench(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
    else:
        main(*sys.argv[1:])
