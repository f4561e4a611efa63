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
