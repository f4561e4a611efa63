"""Performance-report subsystem — observability for transposes/halos/FFT.

TPU-native rebuild of the reference's opt-in performance reporting
(``src/performance.cc``, ``include/internal/performance.h:32-133``,
``common.h:212-244``): where the reference records CUDA event pairs around
each operation into per-configuration circular sample buffers and prints
aggregated tables / CSV exports at destroy time, here a process-global
:class:`PerfRegistry` records wall-clock samples around each *dispatched*
operation (jit boundaries; inside a larger jit the op is fused and cannot be
timed individually — same as the reference's graph-captured paths) plus
derived metrics: total ms and achieved all-to-all bandwidth GB/s, the
headline metric of the reference report (``performance.cc:391,450``).

Enable via env ``CUDECOMP_TPU_ENABLE_PERFORMANCE_REPORT=1`` or
``perf_report_enable()``.  Samples are keyed by an op-configuration tuple
(op name, pencil axis/op pair, buffer shape, dtype, method) like the
reference's config-keyed maps (``performance.h:32-50``).  ``report()``
prints the aggregated table; ``write_csv()`` exports samples with
config-encoding filenames (``performance.cc:480-700`` analog).

Timing helpers for benchmarking (warmup + trials with
``block_until_ready``) live here too, shared by the autotuner and bench.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Callable, Dict, List, Tuple

import numpy as np
import jax


_N_WARMUP_DISCARD = int(os.environ.get("CUDECOMP_TPU_PERF_N_WARMUP", "1"))
_MAX_SAMPLES = int(os.environ.get("CUDECOMP_TPU_PERF_MAX_SAMPLES", "1000"))


@dataclasses.dataclass
class OpSamples:
    """Circular sample buffer per op configuration (common.h:212-244 analog)."""
    key: Tuple
    times_ms: List[float] = dataclasses.field(default_factory=list)
    bytes_moved: int = 0  # per-invocation a2a bytes (for BW derivation)
    n_discarded: int = 0

    def add(self, ms: float):
        if self.n_discarded < _N_WARMUP_DISCARD:
            self.n_discarded += 1
            return
        if len(self.times_ms) >= _MAX_SAMPLES:
            self.times_ms.pop(0)
        self.times_ms.append(ms)


class PerfRegistry:
    def __init__(self):
        self.enabled = os.environ.get(
            "CUDECOMP_TPU_ENABLE_PERFORMANCE_REPORT", "0") == "1"
        self.samples: Dict[Tuple, OpSamples] = {}

    def record(self, key: Tuple, ms: float, bytes_moved: int = 0):
        s = self.samples.get(key)
        if s is None:
            s = self.samples[key] = OpSamples(key=key, bytes_moved=bytes_moved)
        s.add(ms)

    def clear(self):
        self.samples.clear()

    # -- reporting -------------------------------------------------------------

    def rows(self):
        out = []
        for key, s in sorted(self.samples.items(), key=lambda kv: str(kv[0])):
            if not s.times_ms:
                continue
            t = np.array(s.times_ms)
            row = {
                "config": "/".join(str(k) for k in key),
                "count": len(t),
                "avg_ms": float(t.mean()),
                "min_ms": float(t.min()),
                "max_ms": float(t.max()),
                "std_ms": float(t.std()),
            }
            if s.bytes_moved:
                row["a2a_gbps"] = s.bytes_moved / (t.mean() / 1e3) / 1e9
            out.append(row)
        return out

    def report(self) -> str:
        lines = ["CUDECOMP_TPU: performance report",
                 f"{'config':60s} {'count':>6s} {'avg ms':>10s} {'min ms':>10s} "
                 f"{'max ms':>10s} {'std':>8s} {'A2A GB/s':>10s}"]
        for r in self.rows():
            bw = f"{r.get('a2a_gbps', 0):.1f}" if "a2a_gbps" in r else "-"
            lines.append(
                f"{r['config']:60s} {r['count']:6d} {r['avg_ms']:10.4f} "
                f"{r['min_ms']:10.4f} {r['max_ms']:10.4f} {r['std_ms']:8.4f} "
                f"{bw:>10s}")
        return "\n".join(lines)

    def write_csv(self, directory: str = ".", prefix: str = "cudecomp_tpu_perf"):
        """Per-config CSV export with config-encoding filenames."""
        paths = []
        os.makedirs(directory, exist_ok=True)
        for key, s in self.samples.items():
            if not s.times_ms:
                continue
            tag = "_".join(str(k).replace(" ", "").replace("/", "-")
                           for k in key)
            path = os.path.join(directory, f"{prefix}.{tag}.csv")
            with open(path, "w") as f:
                f.write("sample,time_ms\n")
                for i, t in enumerate(s.times_ms):
                    f.write(f"{i},{t}\n")
            paths.append(path)
        return paths


REGISTRY = PerfRegistry()


def perf_report_enable(enable: bool = True):
    REGISTRY.enabled = enable


def maybe_record(key_fn: Callable, run_fn: Callable, arr):
    """Run ``run_fn(arr)``; when reporting is enabled and ``arr`` is a
    concrete array (dispatched, not traced), record a wall-time sample.

    Inside a larger jit the op is fused and cannot be timed individually —
    the same limitation the reference has for CUDA-graph-captured paths."""
    if not REGISTRY.enabled or isinstance(arr, jax.core.Tracer):
        return run_fn(arr)
    t0 = time.perf_counter()
    out = run_fn(arr)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3
    key, nbytes = key_fn()
    REGISTRY.record(key, ms, nbytes)
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a region — the deep-inspection
    analog of the reference's NVTX+Nsight workflow.  View with
    ``tensorboard --logdir <log_dir>`` or Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


# ---------------------------------------------------------------------------
# shared timing protocol (autotune + bench)
# ---------------------------------------------------------------------------

def time_fn(fn, *args, n_warmup: int = 3, n_trials: int = 5,
            reduce: str = "avg") -> Tuple[float, List[float]]:
    """Warmup + timed trials of a compiled callable (autotune.cc:541-626
    protocol); returns (reduced seconds, all trial times)."""
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    red = {"avg": np.mean, "min": np.min, "max": np.max}[reduce]
    return float(red(times)), times
