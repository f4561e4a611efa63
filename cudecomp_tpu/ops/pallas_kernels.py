"""Pallas TPU kernels — direct-RDMA all-to-all (the NVSHMEM analog).

The reference's NVSHMEM backend performs the transpose exchange with
one-sided ``putmem`` operations from device kernels, batching non-blocking
puts and completing with signal counters and team barriers
(``comm_routines.h:122-257``, ``cudecomp_kernels.cuh:50-122``).  The TPU
equivalent is a Pallas kernel issuing ``make_async_remote_copy`` RDMA puts
peer-by-peer over ICI, overlapping all P-1 transfers, completing on DMA
semaphores, and closing with a neighbor barrier.

Exchange contract (same as parallel.collectives): input is ``(P*B, ...)``
blocks where block ``p`` is destined for mesh-axis peer ``p``; output block
``q`` holds data received from peer ``q``.  Device ``me`` sends block
``peer`` into the peer's output slot ``me``.

Used by ``TransposeMethod.PALLAS_A2A``; registered into
``parallel.collectives.EXCHANGES`` on import.  Falls back to
``lax.all_to_all`` on backends without Pallas TPU support.
"""

from __future__ import annotations

import functools

import jax
from jax import lax

from cudecomp_tpu.parallel import collectives as _coll

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _peer_device_id(mesh_axes, axis_name, peer_coord):
    """Device-id kwargs addressing the peer that differs only along
    ``axis_name``: LOGICAL for single-axis meshes (what interpret mode
    supports best), MESH coords dict otherwise."""
    if len(mesh_axes) == 1:
        return dict(device_id=peer_coord,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
    return dict(device_id={axis_name: peer_coord},
                device_id_type=pltpu.DeviceIdType.MESH)


def _a2a_kernel(x_ref, out_ref, local_sem, send_sems, recv_sems,
                *, P, B, axis_name, mesh_axes):
    me = lax.axis_index(axis_name)

    # self block: local HBM->HBM DMA
    local = pltpu.make_async_copy(
        x_ref.at[pl.ds(me * B, B)],
        out_ref.at[pl.ds(me * B, B)],
        local_sem,
    )
    local.start()

    # one-sided puts: block (me+s) -> peer (me+s)'s slot me
    sends = []
    for s in range(1, P):
        peer = (me + s) % P
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(peer * B, B)],
            dst_ref=out_ref.at[pl.ds(me * B, B)],
            send_sem=send_sems.at[s - 1],
            recv_sem=recv_sems.at[s - 1],
            **_peer_device_id(mesh_axes, axis_name, peer),
        )
        rdma.start()
        sends.append(rdma)

    local.wait()
    for rdma in sends:
        rdma.wait_send()
    # wait for the P-1 incoming blocks (peers signal our recv_sems)
    for s in range(1, P):
        peer = (me - s) % P
        pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(me * B, B)],
            dst_ref=out_ref.at[pl.ds(peer * B, B)],
            send_sem=send_sems.at[s - 1],
            recv_sem=recv_sems.at[s - 1],
            **_peer_device_id(mesh_axes, axis_name, peer),
        ).wait_recv()


def pallas_a2a_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() not in ("cpu", "gpu")


def exchange_pallas_a2a(blocks, axis_name: str, n: int, block: int,
                        interpret=None, mesh=None):
    """Direct-RDMA all-to-all; falls back to lax.all_to_all off-TPU.

    ``mesh`` (the enclosing shard_map mesh) is needed to address peers by
    flattened logical id when the mesh has more than one axis.
    ``CUDECOMP_TPU_PALLAS_INTERPRET=1`` forces the TPU interpreter (used by
    the CPU-mesh test suite to validate the RDMA protocol)."""
    if n == 1:
        return blocks
    if interpret is None:
        import os
        interpret = os.environ.get("CUDECOMP_TPU_PALLAS_INTERPRET", "0") == "1"
    if not interpret and not pallas_a2a_available():
        return _coll.exchange_all_to_all(blocks, axis_name, n, block)

    if mesh is not None:
        mesh_axes = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    else:
        mesh_axes = ((axis_name, n),)
    if interpret and len(mesh_axes) > 1:
        # jax's TPU interpreter only discharges remote DMA on single-axis
        # meshes; the kernel protocol is validated by the 1D-mesh tests and
        # the real Mosaic lowering handles MESH coords on any mesh.
        from cudecomp_tpu.utils.env import log_warn
        log_warn("pallas_a2a interpret mode supports single-axis meshes only;"
                 " falling back to lax.all_to_all")
        return _coll.exchange_all_to_all(blocks, axis_name, n, block)
    kernel = functools.partial(_a2a_kernel, P=n, B=block, axis_name=axis_name,
                               mesh_axes=mesh_axes)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7),
        interpret=interpret,
    )(blocks)


if _HAS_PALLAS:
    _coll.EXCHANGES.setdefault("pallas_a2a", exchange_pallas_a2a)
