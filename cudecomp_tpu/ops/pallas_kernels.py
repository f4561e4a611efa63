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


def _flat_peer_index(mesh_axes, axis_name, peer_coord, coord_of):
    """Flattened logical device id of the peer that differs from the
    calling device only along ``axis_name``: mixed-radix accumulation over
    all mesh axes in order (row-major, matching ``mesh.devices.flat``
    order), with the comm axis contributing ``peer_coord`` and every other
    axis the caller's own coordinate via ``coord_of(name)``.

    Pure in its arguments — ``coord_of`` is ``lax.axis_index`` in-kernel
    and a plain dict lookup in the addressing unit tests, so the exact
    arithmetic the kernels execute on multi-axis hardware meshes is
    verified against ``mesh.devices.flat`` indexing without any DMA
    (tests/test_pallas.py::test_flat_peer_index_*)."""
    idx = None
    for name, size in mesh_axes:
        coord = peer_coord if name == axis_name else coord_of(name)
        idx = coord if idx is None else idx * size + coord
    return idx


def _peer_device_id(mesh_axes, axis_name, peer_coord):
    """Device-id kwargs addressing the peer that differs only along
    ``axis_name``: ONE code path for every mesh rank — see
    :func:`_flat_peer_index`.

    On a single-axis mesh this degenerates to ``idx == peer_coord``, so the
    1D-mesh interpreter tests execute exactly the addressing arithmetic
    that multi-axis hardware meshes use (the TPU interpreter only
    discharges remote DMA on single-axis meshes; Mosaic translates LOGICAL
    ids through the launch's device assignment on any mesh)."""
    idx = _flat_peer_index(mesh_axes, axis_name, peer_coord, lax.axis_index)
    return dict(device_id=idx, device_id_type=pltpu.DeviceIdType.LOGICAL)


# collective_id bases per kernel family; each comm axis gets base + its
# position in the mesh axis tuple, so a program doing pallas exchanges over
# BOTH mesh axes (an FFT round trip) never shares one id across distinct
# collectives (Mosaic requires distinct ids per concurrent collective).
_A2A_CID_BASE = 7
_HALO_CID_BASE = 11


def _collective_id(base: int, axis_name: str, mesh_axes) -> int:
    names = [n for n, _ in mesh_axes]
    return base + (names.index(axis_name) if axis_name in names else 0)


def _a2a_kernel(x_ref, out_ref, local_sem, send_sems, recv_sems,
                *, P, B, axis_name, mesh_axes, barrier=True):
    me = lax.axis_index(axis_name)

    if P > 1 and barrier:
        # entry barrier with every peer: no one-sided put may land in a
        # device's out_ref before that device has entered the kernel
        # (its buffers exist and no stale program is touching them).
        # This is also what makes ``collective_id`` legal — Mosaic
        # rejects it when the kernel has no custom barrier
        # (jax tpu_custom_call: 'collective_id has to be unspecified or
        # None when not using a custom barrier'); pattern per
        # jax.experimental.pallas.ops.tpu.all_gather.
        bsem = pltpu.get_barrier_semaphore()
        for s in range(1, P):
            pltpu.semaphore_signal(
                bsem, 1,
                **_peer_device_id(mesh_axes, axis_name, (me + s) % P))
        pltpu.semaphore_wait(bsem, P - 1)

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


@functools.lru_cache(maxsize=None)
def _platform_supports_pallas(platform: str) -> bool:
    """Known-good allowlist + probe-once for unknown platforms.

    ``tpu`` is known good; ``cpu``/``gpu`` lack the TPU RDMA lowering.  Any
    other platform (an experimental TPU plugin, e.g. tunneled runtimes) is
    probed once with a tiny single-device Mosaic kernel on a device OF THAT
    PLATFORM and the result cached — an unknown plugin without Pallas
    support falls back instead of crashing mid-transpose."""
    if platform == "tpu":
        return True
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return False
    try:
        import numpy as np

        def copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        x_np = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
        x = jax.device_put(x_np, jax.devices(platform)[0])
        got = jax.jit(lambda v: pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(v))(x)
        return bool((np.asarray(jax.device_get(got)) == x_np).all())
    except Exception:
        return False


def pallas_a2a_available(platform: str = None) -> bool:
    """Pallas RDMA support for ``platform`` (the platform of the mesh the
    kernel will run on — NOT the process default backend: a CPU test mesh
    inside a TPU-default process must fall back)."""
    if not _HAS_PALLAS:
        return False
    return _platform_supports_pallas(platform or jax.default_backend())


def _mesh_platform(mesh):
    return mesh.devices.flat[0].platform if mesh is not None else None


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
    if not interpret and not pallas_a2a_available(_mesh_platform(mesh)):
        return _coll.exchange_all_to_all(blocks, axis_name, n, block)

    if mesh is not None:
        mesh_axes = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    else:
        mesh_axes = ((axis_name, n),)
    if interpret and len(mesh_axes) > 1:
        # jax's TPU interpreter refuses remote DMA on any multi-axis mesh
        # (NotImplementedError in dma_start_p for every device-id type).
        # The kernel protocol AND the shared mixed-radix logical addressing
        # (_peer_device_id) are executed by the 1D-mesh tests — including
        # engine-level transposes on a 1D slab mesh (test_pallas.py) — and
        # the real Mosaic lowering resolves LOGICAL ids on any mesh.
        from cudecomp_tpu.utils.env import log_warn
        log_warn("pallas_a2a interpret mode supports single-axis meshes only;"
                 " falling back to lax.all_to_all")
        return _coll.exchange_all_to_all(blocks, axis_name, n, block)
    # the interpreter cannot lower get_barrier_semaphore; the barrier is
    # exactly the real-lowering requirement (Mosaic rejects collective_id
    # without one), so interpret runs validate the DMA protocol barrier-free
    kernel = functools.partial(_a2a_kernel, P=n, B=block, axis_name=axis_name,
                               mesh_axes=mesh_axes, barrier=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_collective_id(_A2A_CID_BASE, axis_name,
                                         mesh_axes)),
        interpret=interpret,
    )(blocks)


if _HAS_PALLAS:
    _coll.EXCHANGES.setdefault("pallas_a2a", exchange_pallas_a2a)


def mosaic_smoke(n: int = 1024, interpret: bool = False) -> bool:
    """Single-chip Mosaic compile-and-run smoke of the RDMA kernel skeleton.

    Multi-chip hardware may be unavailable in dev environments, so this
    drives the P=1 degenerate program of ``_a2a_kernel`` — the same
    pallas_call plumbing (ANY memory space refs, DMA semaphores, local
    async copy) lowered by the real Mosaic compiler rather than the
    interpreter — plus the tiled transpose kernel, and validates outputs.
    """
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    from cudecomp_tpu.parallel.collectives import shard_map_fn

    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]), ("smoke",))
    kernel = functools.partial(_a2a_kernel, P=1, B=n, axis_name="smoke",
                               mesh_axes=(("smoke", 1),))

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((1,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            # no collective_id: the P=1 program has no remote DMA barrier,
            # and Mosaic rejects collective_id without one
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(x)

    x_np = np.arange(n * 256, dtype=np.float32).reshape(n, 256)
    x = jax.device_put(x_np, NamedSharding(mesh, PartitionSpec()))
    fn = jax.jit(shard_map_fn(call, mesh, in_specs=(PartitionSpec(),),
                              out_specs=PartitionSpec()))
    got = np.asarray(jax.device_get(fn(x)))
    ok = bool((got == x_np).all())

    y = jax.device_put(x_np, dev)
    got_t = np.asarray(jax.device_get(
        jax.jit(lambda v: pallas_transpose2d(v, tm=256, tn=256,
                                             interpret=interpret))(y)))
    return ok and bool((got_t == x_np.T).all())


# ---------------------------------------------------------------------------
# local permute kernel (cuTENSOR analog)
# ---------------------------------------------------------------------------

def _transpose2d_kernel(x_ref, out_ref):
    out_ref[...] = x_ref[...].T


def pallas_transpose2d(x, tm: int = 256, tn: int = 256, interpret=False):
    """Tiled 2D transpose (M, N) -> (N, M) through VMEM.

    The engine's local permutes between cyclic memory orders are exactly one
    large 2D transpose: a cyclic 3D permutation keeps two adjacent dims
    together, so ``(I, J, K) -> (J, K, I)`` is ``(I, J*K) -> (J*K, I)``.
    This kernel is the cuTENSOR-permute analog (``localPermute``,
    transpose.h:80-157) for the hot single-chip path.
    """
    M, N = x.shape
    tm = min(tm, M)
    tn = min(tn, N)
    if M % tm or N % tn:
        return x.T  # ragged tail: let XLA handle it
    if not interpret and ((tm % 128 and tm != M) or (tn % 128 and tn != N)):
        # Mosaic requires the last two block dims divisible by (8, 128) or
        # equal to the array dims; the tile appears transposed in the output
        # spec, so both tile dims must satisfy the 128-lane rule
        return x.T
    grid = (M // tm, N // tn)
    params = {}
    if tm * tn * x.dtype.itemsize > 4 * 1024 * 1024:
        # big-tile plans (1024^3 under the block cap) exceed Mosaic's
        # default VMEM budget once double-buffered; raise the limit
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        _transpose2d_kernel,
        out_shape=jax.ShapeDtypeStruct((N, M), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i)),
        interpret=interpret,
        **params,
    )(x)


def _pick_tile(m: int, cap: int = 512) -> int:
    """Largest Mosaic-legal tile for an extent: a multiple of 128 dividing
    ``m`` (<= cap), or ``m`` itself when m <= cap (a block dim equal to the
    array dim is always legal)."""
    for t in range(cap, 127, -128):
        if m % t == 0:
            return t
    return m if m <= cap else 0


# remote-Mosaic grid cap: the tunnel compiler HANGS compiling 1024-block
# grids (measured r4: a (384,1152)-tile 768^3 kernel = 1024 blocks never
# finished compiling while the 768-block (768,768) variant compiled in
# ~60 s); stay strictly below 1024.  A toolchain-specific quirk, so it is
# tunable: CUDECOMP_TPU_PERMUTE_GRID_CAP overrides (lazily re-read).
_GRID_CAP = 896


def _grid_cap() -> int:
    import os
    ov = os.environ.get("CUDECOMP_TPU_PERMUTE_GRID_CAP")
    if ov:
        try:
            return int(ov)
        except ValueError:
            from cudecomp_tpu.utils.env import log_warn
            log_warn(
                f"ignoring malformed CUDECOMP_TPU_PERMUTE_GRID_CAP {ov!r}")
    return _GRID_CAP
# per-block VMEM budget: Pallas double-buffers both operands, so usable
# VMEM ~= 4x the input block; blocks past 4 MB get an explicit raised
# vmem limit in pallas_transpose2d (1024^3 needs 8 MB blocks to stay
# under the grid cap)
_TILE_BYTES_CAP = 8 * 1024 * 1024


def _tile_options(m: int, max_tile: int):
    """Mosaic-legal tiles for extent ``m``: multiples of 128 dividing it,
    plus the full extent, bounded by ``max_tile``."""
    # inclusive bound: the exactly-max_tile tile is legal (the byte cap
    # check downstream uses >), and for m > max_tile it may be the only
    # one-pass-eligible divisor
    opts = [t for t in range(128, min(m, max_tile) + 1, 128) if m % t == 0]
    if m <= max_tile and m not in opts:
        opts.append(m)
    return opts


def _plan_tiles(M: int, N: int, itemsize: int = 4):
    """Tile plan for the (M, N) -> (N, M) transpose kernel, or None.

    Preference order: the measured-optimal <=512 tiles when their grid fits
    the remote-compiler block cap; otherwise the smallest legal tiles whose
    grid fits — larger tiles trade Mosaic block count for VMEM, which is
    what lets 768^3/1024^3 cyclic permutes (2304/4096 blocks at 512 tiles)
    stay on the one-pass kernel instead of falling off to XLA's two-pass
    permute (the localPermute huge-tensor chunking analog,
    transpose.h:93-135).

    ``CUDECOMP_TPU_PERMUTE_TILES=tmxtn`` forces a specific (legal) tile
    pair — the measurement knob behind the committed preference order."""
    import os
    ov = os.environ.get("CUDECOMP_TPU_PERMUTE_TILES")
    if ov:
        try:
            tm, tn = (int(v) for v in ov.lower().split("x"))
        except ValueError:
            from cudecomp_tpu.utils.env import log_warn
            log_warn(f"ignoring malformed CUDECOMP_TPU_PERMUTE_TILES {ov!r}")
        else:
            if (M % tm == 0 and N % tn == 0
                    and (tm % 128 == 0 or tm == M)
                    and (tn % 128 == 0 or tn == N)):
                return tm, tn
    tm, tn = _pick_tile(M), _pick_tile(N)
    if tm and tn and (M // tm) * (N // tn) <= _grid_cap():
        return tm, tn
    max_tile = _TILE_BYTES_CAP // (128 * itemsize)  # partner tile >= 128
    opts_m = _tile_options(M, max_tile)
    opts_n = _tile_options(N, max_tile)
    # two preference passes: square tiles first (the measured-good shapes —
    # (512,512) at 512^3, (768,768) at 768^3 hold the one-pass rate;
    # skewed aspects are unproven), then any legal pair
    for square_only in (True, False):
        best = None
        for cm in opts_m:
            for cn in opts_n:
                if square_only and cm != cn:
                    continue
                if (M // cm) * (N // cn) > _grid_cap():
                    continue
                if cm * cn * itemsize > _TILE_BYTES_CAP:
                    continue
                key = (cm * cn, (M // cm) * (N // cn), -min(cm, cn))
                if best is None or key < best[0]:
                    best = (key, cm, cn)
        if best:
            return best[1], best[2]
    return None


def _interpret_env() -> bool:
    import os
    return os.environ.get("CUDECOMP_TPU_PALLAS_INTERPRET", "0") == "1"


def _cyclic_kernel_plan(shape, perm, interpret, itemsize: int = 4):
    """Full kernel plan for a cyclic permute, or None when the kernel must
    decline: ((M, N), reshape_out, (tm, tn)).  THE single source for both
    the eligibility predicate and the dispatch, so they cannot diverge
    (and the tile planner runs once per trace, not twice)."""
    if not interpret and jax.default_backend() in ("cpu", "gpu"):
        return None
    if len(shape) != 3 or tuple(perm) not in ((1, 2, 0), (2, 0, 1)):
        return None
    I, J, K = shape
    if tuple(perm) == (1, 2, 0):
        M, N, reshape_out = I, J * K, (J, K, I)
    else:
        M, N, reshape_out = I * J, K, (K, I, J)
    tiles = _plan_tiles(M, N, itemsize)
    if tiles is None:
        return None
    return (M, N), reshape_out, tiles


def cyclic_permute_uses_kernel(shape, perm, interpret=None,
                               itemsize: int = 4) -> bool:
    """Would :func:`pallas_cyclic_permute` run the Pallas kernel for this
    (3D shape, perm) — i.e. NOT take its jnp.transpose fallback?  ONE
    predicate shared by the kernel dispatch itself and by
    ``performance.segment_roundtrip``, whose chained single-chip
    measurement is only fold-proof when the chain really contains opaque
    kernel calls: the tile/grid caps decline at e.g. 768^3 or prime
    extents, and interpret-off cpu/gpu processes have no Mosaic lowering
    — in both cases the identity chain would fold to nothing."""
    if interpret is None:
        interpret = _interpret_env()
    return _cyclic_kernel_plan(shape, perm, interpret, itemsize) is not None


def pallas_cyclic_permute(x, perm, interpret=None, force=None):
    """Cyclic 3D permutation via the tiled 2D-transpose kernel.

    perm (1, 2, 0): out[a,b,c] = x[c,a,b]  -> view (I, J*K) -> transpose.
    perm (2, 0, 1): out[a,b,c] = x[b,c,a]  -> view (I*J, K) -> transpose.
    Other perms (or non-TPU platforms) fall back to jnp.transpose.

    Why this exists (measured on v5e, device-trace timing, BENCH_NOTES.md
    r3): XLA lowers a large cyclic permute as TWO full HBM copy passes
    (512^3 f32: 3.22 ms = 333 GB/s effective), while this kernel's tiled
    VMEM transpose makes ONE pass at the chip's streaming rate (1.63 ms =
    658 GB/s).  It is the cuTENSOR-localPermute analog (transpose.h:80-157)
    for the engine's single-chip/slab hot path.

    ``force=False`` always falls back to XLA; otherwise the ONE shared
    predicate :func:`cyclic_permute_uses_kernel` decides (backend,
    interpret flag, tile/grid caps — the grid cap keeps the Mosaic block
    count small, the remote compiler hangs past ~2000 blocks).
    """
    import jax.numpy as jnp
    if interpret is None:
        interpret = _interpret_env()
    plan = None if force is False else _cyclic_kernel_plan(
        x.shape, perm, interpret, x.dtype.itemsize)
    if plan is None:
        return jnp.transpose(x, perm)
    (M, N), reshape_out, (tm, tn) = plan
    out = pallas_transpose2d(x.reshape(M, N), tm, tn, interpret=interpret)
    return out.reshape(reshape_out)


# ---------------------------------------------------------------------------
# halo exchange kernel (HaloMethod.PALLAS)
# ---------------------------------------------------------------------------

def _sl(ndim, i_d, start, size):
    """Index tuple slicing dim ``i_d`` as [start, start+size)."""
    return tuple(slice(None) for _ in range(i_d)) + (pl.ds(start, size),)


def _halo_kernel(x_ref, splits_ref, out_ref, send_sems, recv_sems,
                 *, P, h, m, i_d, ndim, axis_name, mesh_axes, splits,
                 barrier=True):
    """Periodic one-sided halo ring exchange along array dim ``i_d``: each
    device puts its low interior slab [h, 2h) into the left neighbor\'s
    high-halo slot [h+m, h+m+h), and its high interior slab [v, v+h) (v =
    this device\'s valid interior extent, == m for even splits) into the
    right neighbor\'s low-halo slot [0, h).  x_ref is aliased to out_ref
    (in-place: only halo slots are written, by remote peers).

    Non-periodic boundaries are handled functionally by the caller (edge
    halos restored after the ring exchange) so the kernel stays branch-free
    — predicated remote DMAs are not portable across lowerings."""
    me = lax.axis_index(axis_name)
    left = (me - 1) % P
    right = (me + 1) % P
    if P > 1 and barrier:
        # entry barrier with both ring neighbors (see _a2a_kernel): the
        # in-place puts write the peers' halo slots directly
        bsem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            bsem, 1, **_peer_device_id(mesh_axes, axis_name, left))
        pltpu.semaphore_signal(
            bsem, 1, **_peer_device_id(mesh_axes, axis_name, right))
        pltpu.semaphore_wait(bsem, 2)
    if len(set(splits)) == 1:
        v = splits[0]  # static offset
    else:
        # uneven splits: this device's high interior slab starts at its own
        # valid extent — a scalar load from the SMEM splits table
        v = splits_ref[me]

    # -> right neighbor\'s low halo
    to_right = pltpu.make_async_remote_copy(
        src_ref=out_ref.at[_sl(ndim, i_d, v, h)],      # high interior slab
        dst_ref=out_ref.at[_sl(ndim, i_d, 0, h)],
        send_sem=send_sems.at[0],
        recv_sem=recv_sems.at[0],
        **_peer_device_id(mesh_axes, axis_name, right),
    )
    # -> left neighbor\'s high halo
    to_left = pltpu.make_async_remote_copy(
        src_ref=out_ref.at[_sl(ndim, i_d, h, h)],      # low interior slab
        dst_ref=out_ref.at[_sl(ndim, i_d, h + m, h)],
        send_sem=send_sems.at[1],
        recv_sem=recv_sems.at[1],
        **_peer_device_id(mesh_axes, axis_name, left),
    )
    to_right.start()
    to_left.start()
    to_right.wait()
    to_left.wait()


def halo_exchange_pallas(local, axis_name: str, P: int, h: int, m: int,
                         i_d: int, periodic: bool, mesh=None, interpret=None,
                         splits=None):
    """In-place halo exchange via RDMA puts.

    ``splits`` gives per-device valid interior extents for non-divisible
    decompositions (defaults to even: all ``m``)."""
    if interpret is None:
        import os
        interpret = os.environ.get("CUDECOMP_TPU_PALLAS_INTERPRET", "0") == "1"
    if mesh is not None:
        mesh_axes = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    else:
        mesh_axes = ((axis_name, P),)
    if (not interpret and not pallas_a2a_available(_mesh_platform(mesh))) or (
            interpret and len(mesh_axes) > 1):
        return None  # caller falls back
    import jax.numpy as jnp

    splits = tuple(splits) if splits is not None else (m,) * P
    kernel = functools.partial(_halo_kernel, P=P, h=h, m=m, i_d=i_d,
                               ndim=local.ndim, splits=splits,
                               axis_name=axis_name, mesh_axes=mesh_axes,
                               barrier=not interpret)
    idx_lo = _sl(local.ndim, i_d, 0, h)
    idx_hi = _sl(local.ndim, i_d, h + m, h)
    if not periodic:
        # save edge halos before the ring exchange (functional: reads see
        # pre-kernel values)
        save_lo = local[tuple(slice(0, h) if d == i_d else slice(None)
                              for d in range(local.ndim))]
        save_hi = local[tuple(slice(h + m, h + m + h) if d == i_d
                              else slice(None) for d in range(local.ndim))]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(local.shape, local.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_collective_id(_HALO_CID_BASE, axis_name,
                                         mesh_axes)),
        interpret=interpret,
    )(local, jnp.asarray(splits, dtype=jnp.int32))
    if not periodic:
        me = lax.axis_index(axis_name)
        lo_slc = tuple(slice(0, h) if d == i_d else slice(None)
                       for d in range(local.ndim))
        hi_slc = tuple(slice(h + m, h + m + h) if d == i_d else slice(None)
                       for d in range(local.ndim))
        out = out.at[lo_slc].set(jnp.where(me == 0, save_lo, out[lo_slc]))
        out = out.at[hi_slc].set(jnp.where(me == P - 1, save_hi, out[hi_slc]))
    return out
