"""Runtime autotuner — process-grid shape x transpose strategy search.

TPU-native rebuild of ``src/autotune.cc``: where the reference sweeps pdims
factor pairs x communication backends with CUDA-event-timed trials
(``autotuneTransposeBackend`` :275-769, ``autotuneHaloBackend`` :771-1124),
this sweeps pdims factor pairs x XLA collective strategies with
compiled-program wall timings (``block_until_ready``), keeping the
reference's protocol structure:

  * per-candidate warmup + timed trials (3 + 5 by default, :541-626);
  * per-op weighted sums over the 4-transpose round trip X2Y;Y2Z;Z2Y;Y2X;
  * skip-threshold early-out: abandon a candidate whose first trial already
    exceeds ``skip_threshold * best`` (:578-602);
  * two-phase dispatch: transpose (grid + strategy) first, then halo strategy
    with the grid fixed (``src/cudecomp.cc:1200-1211``);
  * empty-pencil candidates are skipped (:334-373).

The winner is frozen into the returned :class:`GridDescriptor`'s config, the
analog of the autotuned config copied back to the caller
(``src/cudecomp.cc:1248-1265``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cudecomp_tpu import geometry
from cudecomp_tpu.config import (AutotuneOptions, GridConfig, HaloMethod,
                                 TransposeMethod)
from cudecomp_tpu.grid import GridDescriptor, build_mesh


@dataclasses.dataclass
class TrialRecord:
    pdims: Tuple[int, int]
    method: str
    times_s: Tuple[float, ...]   # per-trial weighted round-trip seconds
    avg_s: float
    min_s: float
    skipped: bool = False


@dataclasses.dataclass
class AutotuneResult:
    grid: GridDescriptor
    best_pdims: Tuple[int, int]
    best_method: TransposeMethod
    best_time_s: float
    trials: List[TrialRecord]
    halo_trials: List[TrialRecord] = dataclasses.field(default_factory=list)
    best_halo_method: Optional[HaloMethod] = None

    def save_json(self, path: str):
        """Persist the tuned choice (+ trial table) so applications can fix
        the configuration and skip re-tuning — the workflow the reference
        docs recommend (docs/autotuning.rst:37-38)."""
        import json
        payload = {
            "best_pdims": list(self.best_pdims),
            "best_method": self.best_method.value,
            "best_halo_method": (self.best_halo_method.value
                                 if self.best_halo_method else None),
            "best_time_s": self.best_time_s,
            "trials": [dataclasses.asdict(t) for t in self.trials],
            "halo_trials": [dataclasses.asdict(t) for t in self.halo_trials],
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)

    def report(self) -> str:
        """Human-readable trial table (perf-report analog)."""
        lines = ["CUDECOMP_TPU: autotune results (avg s | min s):"]
        for t in self.trials:
            status = "SKIPPED" if t.skipped else f"{t.avg_s:.6f} | {t.min_s:.6f}"
            lines.append(f"  pdims={t.pdims} method={t.method:12s} {status}")
        for t in self.halo_trials:
            status = "SKIPPED" if t.skipped else f"{t.avg_s:.6f} | {t.min_s:.6f}"
            lines.append(f"  halo  pdims={t.pdims} method={t.method:12s} {status}")
        lines.append(
            f"  -> selected pdims={self.best_pdims} "
            f"method={self.best_method.value} ({self.best_time_s:.6f} s)")
        return "\n".join(lines)


def load_tuned_config(path: str, base_config: GridConfig) -> GridConfig:
    """Apply a persisted autotune result to a config (skip re-tuning)."""
    import json
    with open(path) as f:
        payload = json.load(f)
    cfg = base_config.with_pdims(payload["best_pdims"])
    cfg = dataclasses.replace(
        cfg, transpose_method=TransposeMethod(payload["best_method"]))
    if payload.get("best_halo_method"):
        cfg = dataclasses.replace(
            cfg, halo_method=HaloMethod(payload["best_halo_method"]))
    return cfg


def _valid_pdims(cfg: GridConfig, nranks: int,
                 options: AutotuneOptions) -> List[Tuple[int, int]]:
    from cudecomp_tpu.utils import env as env_util
    pr_range = options.pr_range or env_util.int_range(
        "CUDECOMP_TPU_AUTOTUNE_P_ROW_RANGE")
    pc_range = options.pc_range or env_util.int_range(
        "CUDECOMP_TPU_AUTOTUNE_P_COL_RANGE")
    out = []
    for pr, pc in geometry.pdim_candidates(nranks):
        if pr_range and not (pr_range[0] <= pr <= pr_range[1]):
            continue
        if pc_range and not (pc_range[0] <= pc <= pc_range[1]):
            continue
        trial = cfg.with_pdims((pr, pc))
        # skip empty-pencil candidates (autotune.cc:334-373)
        ok = True
        for axis in range(3):
            a, b = geometry.pencil_shard_dims(axis)
            if (min(geometry._dist_splits(trial, a, pr)) == 0
                    or min(geometry._dist_splits(trial, b, pc)) == 0):
                ok = False
                break
        if ok:
            out.append((pr, pc))
    return out


def _time_roundtrip(grid: GridDescriptor, dtype, weights,
                    n_warmup: int, n_trials: int,
                    skip_after_first_above: Optional[float]) -> Tuple[List[float], bool]:
    """Weighted 4-op round-trip timings; returns (trial times, skipped)."""
    from cudecomp_tpu.ops import transpose as tr

    cfg = grid.config
    x = jnp.zeros(geometry.global_buffer_shape(cfg, 0), dtype=dtype)
    x = jax.device_put(x, grid.sharding(0))

    ops = [
        jax.jit(lambda a, m=m: f(grid, a, method=m))
        for f, m in [(tr.transpose_x_to_y, cfg.transpose_method),
                     (tr.transpose_y_to_z, cfg.transpose_method),
                     (tr.transpose_z_to_y, cfg.transpose_method),
                     (tr.transpose_y_to_x, cfg.transpose_method)]
    ]

    def run_once():
        # time ops individually for weighting (reference times each op)
        t_ops = []
        b = x
        for op in ops:
            t0 = time.perf_counter()
            b = op(b)
            jax.block_until_ready(b)
            t_ops.append(time.perf_counter() - t0)
        return sum(w * t for w, t in zip(weights, t_ops))

    for _ in range(n_warmup):
        run_once()
    times = []
    for i in range(n_trials):
        t = run_once()
        if i == 0 and skip_after_first_above is not None and t > skip_after_first_above:
            return [t], True
        times.append(t)
    return times, False


def _time_halo(grid: GridDescriptor, dtype, options: AutotuneOptions,
               n_warmup: int, n_trials: int) -> List[float]:
    from cudecomp_tpu.ops.halo import update_halos

    cfg = grid.config
    axis = options.halo_axis
    he = options.halo_extents
    x = jnp.zeros(geometry.global_buffer_shape(cfg, axis, he), dtype=dtype)
    x = jax.device_put(x, grid.sharding(axis))
    fn = jax.jit(lambda a: update_halos(grid, a, axis, he, options.halo_periods))
    for _ in range(n_warmup):
        jax.block_until_ready(fn(x))
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        times.append(time.perf_counter() - t0)
    return times


def autotune(
    config: GridConfig,
    devices: Optional[Sequence[jax.Device]] = None,
    options: Optional[AutotuneOptions] = None,
    axis_names: Tuple[str, str] = ("pr", "pc"),
    dtype=None,
) -> AutotuneResult:
    """Search (pdims x transpose strategy), then halo strategy, and return a
    GridDescriptor with the winning configuration frozen in."""
    options = options or AutotuneOptions()
    if devices is None:
        devices = jax.devices()
    nranks = len(devices)
    dtype = dtype or jnp.complex64

    if config.autotune_pdims:
        pdims_cands = _valid_pdims(config, nranks, options)
        if not pdims_cands:
            raise ValueError(f"no valid process-grid factorization of {nranks} "
                             f"devices for gdims {config.gdims}")
    else:
        pdims_cands = [config.pdims]

    from cudecomp_tpu.utils import env as env_util
    if options.autotune_transpose_method:
        methods = list(options.methods or env_util.filter_candidates(
            "CUDECOMP_TPU_AUTOTUNE_TRANSPOSE_METHODS",
            (TransposeMethod.ALL_TO_ALL, TransposeMethod.RING,
             TransposeMethod.RING_XOR)))
    else:
        methods = [config.transpose_method]

    weights = options.transpose_op_weights
    trials: List[TrialRecord] = []
    best = None  # (time, pdims, method, grid)

    for pdims in pdims_cands:
        mesh = build_mesh(pdims, devices=devices, rank_order=config.rank_order,
                          axis_names=axis_names)
        for method in methods:
            cfg = dataclasses.replace(config.with_pdims(pdims),
                                      transpose_method=method)
            grid = GridDescriptor(config=cfg, mesh=mesh, axis_names=axis_names)
            threshold = None
            if options.skip_threshold > 0 and best is not None:
                threshold = options.skip_threshold * best[0]
            try:
                times, skipped = _time_roundtrip(
                    grid, dtype, weights, options.n_warmup, options.n_trials,
                    threshold)
            except Exception:
                # candidate failed to compile/run (OOM analog) — skip it,
                # like the reference's collective OOM fallback (autotune.cc:437-447)
                trials.append(TrialRecord(pdims, method.value, (), float("inf"),
                                          float("inf"), skipped=True))
                continue
            avg = float(np.mean(times))
            rec = TrialRecord(pdims, method.value, tuple(times), avg,
                              float(np.min(times)), skipped=skipped)
            trials.append(rec)
            if not skipped and (best is None or avg < best[0]):
                best = (avg, pdims, method, grid)

    if best is None:
        raise RuntimeError("autotuning failed: every candidate was skipped")

    best_time, best_pdims, best_method, best_grid = best

    halo_trials: List[TrialRecord] = []
    best_halo = None
    if options.autotune_halo_method and any(options.halo_extents):
        halo_methods = list(options.halo_methods or (HaloMethod.PPERMUTE,))
        hbest = None
        for hm in halo_methods:
            cfg = dataclasses.replace(best_grid.config, halo_method=hm)
            grid = GridDescriptor(config=cfg, mesh=best_grid.mesh,
                                  axis_names=axis_names)
            times = _time_halo(grid, dtype, options, options.n_warmup,
                               options.n_trials)
            avg = float(np.mean(times))
            halo_trials.append(TrialRecord(best_pdims, hm.value, tuple(times),
                                           avg, float(np.min(times))))
            if hbest is None or avg < hbest[0]:
                hbest = (avg, hm, grid)
        if hbest is not None:
            best_halo = hbest[1]
            best_grid = hbest[2]

    return AutotuneResult(grid=best_grid, best_pdims=best_pdims,
                          best_method=best_method, best_time_s=best_time,
                          trials=trials, halo_trials=halo_trials,
                          best_halo_method=best_halo)
