"""Real 2-process multi-controller smoke (VERDICT r2 item 9).

Spawns two python subprocesses that form a jax.distributed CPU cluster
(2 local devices each -> 4 global devices) and exercise the cross-host
paths that are otherwise only mock-tested: ``autotune._allreduce_trials``,
``performance.rows(cross_host=True)``, and ``save_pencil``/``load_pencil``
with non-addressable shards (every process writes only its own shards; the
barrier makes the checkpoint complete when save returns).

Skipped when the runtime cannot form a multi-process CPU cluster.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
port, pid, ckpt = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
print("CLUSTER_UP", flush=True)

sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
import cudecomp_tpu as cd
from cudecomp_tpu.utils import checkpoint as ckpt_mod
from cudecomp_tpu.autotune import _allreduce_trials
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.parallel.mesh import (axis_group_size, build_decomp_mesh,
                                        n_slices)

# 1. cross-host trial reduction: per-process times differ, reduced scores
#    must be identical on every host (deterministic winner selection)
out = _allreduce_trials([1.0 + pid, 3.0 + pid])
assert out == [1.5, 3.5], out

# 2. topology discovery on a REAL two-tier cluster: the process boundary is
#    the slow tier (the CPU analog of the reference's hostname grouping,
#    cudecomp.cc:508-595).  build_decomp_mesh must place whole fast groups
#    so the pr-axis (X<->Y) collectives never cross it.
assert n_slices() == 2, n_slices()
mesh = build_decomp_mesh((2, 4))
grid_devs = np.asarray(mesh.devices)
for j in range(4):
    col = {d.process_index for d in grid_devs[:, j]}
    assert len(col) == 1, (j, col)  # each pr column inside one process
assert axis_group_size(mesh, "pc") == 2, axis_group_size(mesh, "pc")
assert axis_group_size(mesh, "pr") == 2, axis_group_size(mesh, "pr")

# 3. checkpoint save/load with non-addressable shards: 8-device global mesh,
#    each process addresses only its 4 local devices
cfg = GridConfig(gdims=(8, 12, 16), pdims=(2, 4))
grid = cd.make_grid(cfg, mesh=mesh)
f = np.arange(8 * 12 * 16, dtype=np.float64).reshape(8, 12, 16)
x = cd.scatter_global(grid, f, 0)
n_local = len(x.addressable_shards)
assert n_local == 4, n_local  # truly multi-controller: partial visibility
ckpt_mod.save_pencil(ckpt, grid, x, 0)
# save_pencil returned => checkpoint complete on shared storage (barrier)
assert os.path.exists(os.path.join(ckpt, "meta.json"))
y = ckpt_mod.load_pencil(ckpt, grid)
# compare only addressable shards (no process can see the global array)
for sx, sy in zip(x.addressable_shards, y.addressable_shards):
    np.testing.assert_array_equal(np.asarray(sx.data), np.asarray(sy.data))

# 4. the two-tier hierarchical exchange over the real process boundary:
#    Y<->Z communicates over pc (4 ranks spanning both processes, group=2),
#    so ring_hier's inter-group ppermute steps actually cross the slow tier
#    (the path that was previously exercised only with mocked slice ids)
yp = cd.transpose_x_to_y(grid, x)                       # over pr (fast tier)
zp = cd.transpose_y_to_z(grid, yp, method="ring_hier")  # over pc (two-tier)
z_exp = cd.scatter_global(grid, f, 2)
for sa, sb in zip(zp.addressable_shards, z_exp.addressable_shards):
    np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))

# 5. cross-host perf reduction (collective: both processes call it)
from cudecomp_tpu import performance as perf
perf.REGISTRY.clear()
perf.REGISTRY.enabled = True
y2 = cd.transpose_x_to_y(grid, x)
y2 = cd.transpose_x_to_y(grid, x)  # first sample is warmup-discarded
rows = perf.REGISTRY.rows(cross_host=True)
assert rows and all("avg_ms" in r for r in rows), rows
perf.REGISTRY.enabled = False

# 6. FFT plan autotuning across the cluster: the _allreduce_trials
#    reduction inside autotune_fft must make every process pin the SAME
#    policy (collective: both processes sweep the same candidates)
res = cd.autotune_fft(grid, real=True, n_warmup=1, n_trials=1, iters=2)
pol = (res.plan.precision, res.plan.gauss)
print(f"FFT_POLICY {pol[0]} {int(pol[1])}", flush=True)

# 7. halo-driven grid selection with real cross-process halo exchanges
from cudecomp_tpu.autotune import autotune
opts = cd.AutotuneOptions(n_warmup=1, n_trials=1, grid_mode="halo",
                          halo_extents=(1, 1, 1))
res2 = autotune(GridConfig(gdims=(8, 8, 8), pdims=(0, 0)), options=opts)
print(f"HALO_GRID {res2.best_pdims[0]}x{res2.best_pdims[1]} "
      f"{res2.best_halo_method.value}", flush=True)

# 8. ghost-plane stencil pipeline over the REAL process boundary: on this
#    mesh dim 2 of the X-pencil shards over pc (spans both processes), so
#    diffusion_step's paired-ppermute ghost exchange crosses the slow tier
lap_in = np.cos(2 * np.pi * np.arange(8) / 8)[:, None, None] * np.ones(
    (8, 12, 16))
xs_l = cd.scatter_global(grid, lap_in, 0)
st = cd.diffusion_step(grid, xs_l, 0.05, 0, (True, True, True))
# reference: 7-point periodic Laplacian via numpy rolls
acc = -6.0 * lap_in
for d in range(3):
    acc += np.roll(lap_in, 1, axis=d) + np.roll(lap_in, -1, axis=d)
ref = lap_in + 0.05 * acc
st_exp = cd.scatter_global(grid, ref, 0)
for sa, sb in zip(st.addressable_shards, st_exp.addressable_shards):
    np.testing.assert_allclose(np.asarray(sa.data), np.asarray(sb.data),
                               atol=1e-12)

# 9. spectral operator library across the cluster: d/dx of an analytic
#    field through the distributed r2c plan (forward + derivative +
#    inverse all ride the cross-process transpose pipeline)
from cudecomp_tpu.ops.spectral import SpectralOperators
plan = cd.DistributedFFT(grid=grid, real=True)
sops = SpectralOperators(plan=plan, dtype=np.float64)
sin_x = np.sin(2 * np.pi * np.arange(8) / 8 * 3)[:, None, None] * np.ones(
    (8, 12, 16))
sx = cd.scatter_global(grid, sin_x, 0)
dx = plan.inverse(sops.derivative(plan.forward(sx), 0))
cos_ref = 3 * np.cos(2 * np.pi * np.arange(8) / 8 * 3)[:, None, None] \
    * np.ones((8, 12, 16))
dx_exp = cd.scatter_global(grid, cos_ref, 0)
for sa, sb in zip(dx.addressable_shards, dx_exp.addressable_shards):
    np.testing.assert_allclose(np.asarray(sa.data), np.asarray(sb.data),
                               atol=1e-8)

print("MULTIHOST_OK", flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    ckpt = str(tmp_path / "ckpt")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid), ckpt],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        outs = []
        for p in procs:
            p.kill()
            out, _ = p.communicate()
            outs.append(out.decode(errors="replace"))
        if any("CLUSTER_UP" in o for o in outs):
            # the cluster formed and then hung — a real regression (e.g. a
            # missing save_pencil barrier deadlock), NOT an environment
            # limitation: fail, don't skip
            raise AssertionError(
                "2-process cluster formed but hung mid-test:\n"
                + "\n".join(o[-2000:] for o in outs))
        pytest.skip("multi-process CPU cluster never formed (runtime "
                    "without distributed CPU support)")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "MULTIHOST_OK" not in joined and (
                "distributed" in joined.lower()
                or "initialize" in joined.lower()
                or "grpc" in joined.lower()):
            pytest.skip(f"distributed CPU cluster unavailable: "
                        f"{joined[-500:]}")
        raise AssertionError(f"worker failed:\n{joined[-4000:]}")
    for out in outs:
        assert "MULTIHOST_OK" in out, out[-4000:]
    # cross-host determinism: both processes pinned the same FFT policy
    # and selected the same halo-driven grid
    import re
    policies = {re.search(r"FFT_POLICY (\S+ \d)", o).group(1) for o in outs}
    assert len(policies) == 1, policies
    grids = {re.search(r"HALO_GRID (\S+ \S+)", o).group(1) for o in outs}
    assert len(grids) == 1, grids
