"""Cross-check segment_roundtrip's wall-clock protocol against in-device
profiler truth (VERDICT r2 weak item 6).

segment_roundtrip times each single-chip op in its own scan and reports
wall-clock; its honesty rests on (a) the dispatch RTT amortizing at
iters=32 and (b) the *1.0000001 pin fusing for free.  This script captures
a jax.profiler trace of the SAME per-op scanned programs and compares the
summed TPU-device op time per iteration against the wall-clock number.

    python scripts/profile_transpose_trace.py [N]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from jax import lax
import jax.numpy as jnp


def main(N=512, ITERS=32):
    import cudecomp_tpu as cd
    from cudecomp_tpu.config import GridConfig
    from cudecomp_tpu import performance as perf
    from cudecomp_tpu.ops import transpose as tr

    cfg = GridConfig(gdims=(N, N, N), pdims=(1, 1),
                     transpose_axis_contiguous=(True, True, True))
    grid = cd.make_grid(cfg, devices=jax.devices()[:1])

    seg = perf.segment_roundtrip(grid, np.float32, iters=ITERS, n_warmup=2,
                                 n_trials=3, record=False)
    print(f"segment_roundtrip wall-clock: total {seg['total_ms']:.2f} ms "
          f"(a2a {seg['a2a_ms']:.2f}, local {seg['local_ms']:.2f})")

    ops = [(tr.transpose_x_to_y, 0, "x2y"), (tr.transpose_y_to_z, 1, "y2z"),
           (tr.transpose_z_to_y, 2, "z2y"), (tr.transpose_y_to_x, 1, "y2x")]
    dev_total = 0.0
    for op, in_ax, tag in ops:
        @jax.jit
        def run(a, op=op):
            out, _ = lax.scan(
                lambda c, _: (op(grid, c) * 1.0000001, ()), a, None,
                length=ITERS)
            return jnp.sum(out[..., :1])

        x = jax.device_put(np.zeros(grid.global_shape(in_ax), np.float32),
                           grid.sharding(in_ax))
        float(run(x))  # compile + warm
        float(run(x))
        logdir = f"/tmp/trtrace_{tag}"
        shutil.rmtree(logdir, ignore_errors=True)
        with perf.profile_trace(logdir):
            float(run(x))
        times = perf.device_op_times(logdir)
        # the jit_* lane entry nests every op; take the largest entry as
        # the program time, drop wrappers
        prog = max((v for k, v in times.items()
                    if k.startswith("jit_") or k == "while"), default=0.0)
        per_iter = prog / ITERS
        dev_total += per_iter
        top = sorted(((v, k) for k, v in times.items()
                      if not k.startswith(("jit_", "$")) and k != "while"),
                     reverse=True)[:3]
        tops = ", ".join(f"{k}={v/ITERS:.2f}" for v, k in top)
        print(f"{tag}: device {per_iter:.2f} ms/iter   [{tops}]")

    print(f"device-time round trip: {dev_total:.2f} ms  "
          f"(wall-clock {seg['total_ms']:.2f} ms, "
          f"bias {seg['total_ms'] - dev_total:+.2f} ms)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
