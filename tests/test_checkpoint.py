"""Checkpoint/restore round trips, including restore onto a different
process grid (re-decomposition on load)."""

import numpy as np
import jax

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig
from cudecomp_tpu.utils import checkpoint as ckpt
from cudecomp_tpu.utils import testing as T


def test_save_load_roundtrip(tmp_path):
    grid = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(2, 2)),
                        devices=jax.devices()[:4])
    f = T.global_index_field((8, 8, 8))
    buf = cd.scatter_global(grid, f, 1)
    ckpt.save_pencil(str(tmp_path / "ck"), grid, buf, 1)
    back = ckpt.load_pencil(str(tmp_path / "ck"), grid)
    np.testing.assert_allclose(cd.gather_global(grid, back, 1), f)


def test_restore_onto_different_grid(tmp_path):
    f = T.global_index_field((8, 8, 8))
    g1 = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(2, 2)),
                      devices=jax.devices()[:4])
    ckpt.save_pencil(str(tmp_path / "ck"), g1,
                     cd.scatter_global(g1, f, 0), 0)
    # restore on an 8-device slab grid, different axis, with halos
    g2 = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(1, 8)),
                      devices=jax.devices()[:8])
    back = ckpt.load_pencil(str(tmp_path / "ck"), g2, axis=2,
                            halo_extents=(1, 1, 1))
    np.testing.assert_allclose(
        cd.gather_global(g2, back, 2, halo_extents=(1, 1, 1)), f)


def test_shard_files_per_coordinate(tmp_path):
    # one .npy interior per process-grid coordinate (multi-host layout)
    grid = cd.make_grid(GridConfig(gdims=(9, 10, 11), pdims=(2, 2)),
                        devices=jax.devices()[:4])
    f = T.global_index_field((9, 10, 11))
    ckpt.save_pencil(str(tmp_path / "ck"), grid,
                     cd.scatter_global(grid, f, 0), 0)
    import os
    names = sorted(p for p in os.listdir(tmp_path / "ck")
                   if p.endswith(".npy"))
    assert names == ["shard_0_0.npy", "shard_0_1.npy",
                     "shard_1_0.npy", "shard_1_1.npy"]
    # shards hold trimmed interiors in natural order (uneven: no pad rows)
    s00 = np.load(tmp_path / "ck" / "shard_0_0.npy")
    assert s00.shape == (9, 5, 6)


def test_save_load_component_dims_and_fill_halos(tmp_path):
    import jax.numpy as jnp
    grid = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(2, 2)),
                        devices=jax.devices()[:4])
    f = T.global_index_field((8, 8, 8), dtype=np.float32)
    buf = cd.scatter_global(grid, f, 0)
    sc = jnp.stack([buf, 2 * buf], axis=-1)  # split-complex style
    ckpt.save_pencil(str(tmp_path / "ck"), grid, sc, 0)
    g2 = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(4, 2)),
                      devices=jax.devices()[:8])
    back = ckpt.load_pencil(str(tmp_path / "ck"), g2, halo_extents=(1, 0, 1),
                            fill_halos=True)
    got = cd.gather_global(g2, back[..., 0], 0, halo_extents=(1, 0, 1))
    np.testing.assert_allclose(got, f)
    got2 = cd.gather_global(g2, back[..., 1], 0, halo_extents=(1, 0, 1))
    np.testing.assert_allclose(got2, 2 * f)
    # fill_halos: buffer equals the engine's periodic halo update
    exp = T.expected_halo_buffer(g2, 0, f, (1, 0, 1), (True, True, True),
                                 dims=[0, 2])
    np.testing.assert_allclose(
        np.asarray(jax.device_get(back[..., 0])), exp)


def test_gdims_mismatch_rejected(tmp_path):
    g1 = cd.make_grid(GridConfig(gdims=(8, 8, 8), pdims=(2, 2)),
                      devices=jax.devices()[:4])
    f = T.global_index_field((8, 8, 8))
    ckpt.save_pencil(str(tmp_path / "ck"), g1, cd.scatter_global(g1, f, 0), 0)
    g2 = cd.make_grid(GridConfig(gdims=(16, 8, 8), pdims=(2, 2)),
                      devices=jax.devices()[:4])
    import pytest
    with pytest.raises(ValueError, match="gdims"):
        ckpt.load_pencil(str(tmp_path / "ck"), g2)
