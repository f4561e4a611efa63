"""Basic usage — the analog of the reference's examples/cc/basic_usage.

Decompose a global field, run the full transpose cycle and a halo update,
and verify the data survives.  Runs on whatever devices are available
(set XLA_FLAGS=--xla_force_host_platform_device_count=8 and
JAX_PLATFORMS=cpu for a virtual mesh).

    python examples/basic_usage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import cudecomp_tpu as cd


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}")

    # pdims (0, 0) runs the autotuner (grid shape x strategy)
    cfg = cd.GridConfig(gdims=(64, 64, 64), pdims=(0, 0))
    grid = cd.make_grid(cfg, autotune_options=cd.AutotuneOptions(
        n_warmup=1, n_trials=2))
    print(f"autotuned: pdims={grid.pdims} "
          f"method={grid.config.transpose_method.value}")

    # pencil info, like cudecompGetPencilInfo
    for axis, name in enumerate("xyz"):
        pi = grid.pencil_info(axis, rank=0)
        print(f"  {name}-pencil rank 0: shape={pi.shape} lo={pi.lo} hi={pi.hi}")

    rng = np.random.default_rng(42)
    f = rng.standard_normal(cfg.gdims)

    x = cd.scatter_global(grid, f, axis=0)
    y = cd.transpose_x_to_y(grid, x)
    z = cd.transpose_y_to_z(grid, y)
    y2 = cd.transpose_z_to_y(grid, z)
    x2 = cd.transpose_y_to_x(grid, y2)
    assert np.allclose(cd.gather_global(grid, x2, 0), f)
    print("transpose cycle: data intact")

    he = (1, 1, 1)
    h = cd.scatter_global(grid, f, 0, halo_extents=he)
    h = cd.update_halos(grid, h, 0, he, halo_periods=(True, True, True))
    assert np.allclose(cd.gather_global(grid, h, 0, halo_extents=he), f)
    print("halo update: interior intact")


if __name__ == "__main__":
    main()
