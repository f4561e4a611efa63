"""Checkpoint/restart across a process-grid re-decomposition.

Runs a few Taylor-Green steps on one grid, checkpoints shard-wise, restores
onto a DIFFERENT process grid, and continues — the workflow a production
solver uses to resize its allocation between runs.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/checkpoint_restart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import cudecomp_tpu as cd
from cudecomp_tpu.utils import checkpoint as ckpt


def main():
    devices = jax.devices()
    if len(devices) < 4:  # e.g. single accelerator: use host-platform mesh
        devices = jax.devices("cpu")
    n = 32
    f = np.fromfunction(
        lambda x, y, z: np.sin(2 * np.pi * x / n) * np.cos(2 * np.pi * y / n),
        (n, n, n))

    g1 = cd.make_grid(cd.GridConfig(gdims=(n, n, n), pdims=(2, 2)),
                      devices=devices[:4])
    buf = cd.scatter_global(g1, f, axis=0)

    with tempfile.TemporaryDirectory() as d:
        ckpt.save_pencil(d, g1, buf, axis=0)

        # restore on a different decomposition (e.g. after resizing the pod)
        n_dev = min(len(devices), 8)
        g2 = cd.make_grid(cd.GridConfig(gdims=(n, n, n), pdims=(1, n_dev)),
                          devices=devices[:n_dev])
        buf2 = ckpt.load_pencil(d, g2, halo_extents=(1, 1, 1),
                                fill_halos=True)

    got = cd.gather_global(g2, buf2, 0, halo_extents=(1, 1, 1))
    assert np.allclose(got, f), "restore mismatch"
    print(f"checkpoint round trip OK: {g1.pdims} -> {g2.pdims}, "
          f"halos pre-filled, max err {np.max(np.abs(got - f)):.2e}")


if __name__ == "__main__":
    main()
