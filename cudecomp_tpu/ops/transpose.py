"""Global transpose engine — the algorithmic core.

TPU-native rebuild of ``cudecompTranspose_`` (``include/internal/
transpose.h:196-905``): one generic routine parameterized on (axis,
direction) implements all four ops as three phases

    local pack  ->  mesh-axis exchange  ->  local unpack

expressed functionally inside ``shard_map``.  Differences from the
reference, by design:

  * Phase elision (the reference's pointer-aliasing special cases,
    transpose.h:326-404) is unnecessary: pack/unpack are ``jnp`` reshapes/
    transposes that XLA fuses or removes; the only explicit fast paths are
    the slab degenerations (comm axis of size 1 -> no collective at all) and
    the divisible-extents path (pack/unpack become metadata-only reshapes
    around one tiled ``lax.all_to_all``).
  * Non-divisible extents use the padded-pencil format (see ``geometry``):
    per-peer chunks are padded to the maximum split with zeros, exchanged at
    uniform size, and the valid sub-blocks reassembled with static slices —
    the pad-to-max analog of the reference's max-pencil workspace sizing.
  * The backend choice collapses to :class:`TransposeMethod` (all_to_all /
    ring / pallas_a2a), see ``parallel.collectives``.
  * Compiled programs are cached per configuration (``_build_transpose_fn``)
    — the analog of the reference's CUDA-graph cache (graph.h:37-51).

All ops are jittable, differentiable, and usable on sub-meshes of larger
training meshes.  Input/output halo extents and padding are supported per-op
exactly like the reference API (``include/cudecomp.h:545-660``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from cudecomp_tpu import geometry
from cudecomp_tpu.config import TransposeMethod
from cudecomp_tpu.geometry import _check_extents
from cudecomp_tpu.parallel.collectives import EXCHANGES, shard_map_fn
from cudecomp_tpu.ops import pallas_kernels as _pallas_kernels  # registers pallas_a2a
from cudecomp_tpu.utils.tracing import trace_range


def _strip_halos_padding(local, order, halo, ms):
    """Slice the interior (max-split extents) out of a haloed/padded buffer.
    Trailing component dims (beyond the 3 pencil dims) pass through."""
    sl = tuple(slice(halo[order[i]], halo[order[i]] + ms[order[i]])
               for i in range(3))
    return local[sl + (...,)]


def _add_halos_padding(local, order, halo, pad):
    """Surround the interior with zeroed halo regions and trailing padding."""
    widths = tuple((halo[order[i]], halo[order[i]] + pad[order[i]])
                   for i in range(3))
    if all(w == (0, 0) for w in widths):
        return local
    return jnp.pad(local, widths + ((0, 0),) * (local.ndim - 3))


def _local_permute_impl(grid) -> str:
    """Implementation of the NET local permute on communication-free ops
    ('pallas' one-pass tiled VMEM transpose, 'xla', or the 'mixed' rule).

    Measured on v5e at 512^3 f32 (device-trace timing, BENCH_NOTES.md r3):
    the Pallas kernel streams ONE pass at 1.63 ms = 658 GB/s (the
    cuTENSOR-localPermute role, transpose.h:80-157), but chaining two
    SAME-direction cyclic Pallas permutes forces a physical sublane
    regroup between them ((8,128) tiling makes the producer's natural 2D
    form and the consumer's wanted 2D view different physical layouts) —
    XLA inserts a 2.3-3.0 ms reshape pass.  An XLA permute absorbs that
    regroup into its own two passes.  In the canonical X2Y;Y2Z;Z2Y;Y2X
    cycle the conflicts sit exactly at Y2Z and Y2X, so the 'mixed' rule
    (Pallas for X2Y/Z2Y, XLA for Y2Z/Y2X) hits the tiling-obstruction
    floor: 9.6 ms vs 16.6 all-Pallas / 23+ all-XLA at 512^3
    (BENCH_NOTES.md r3 "PXPX").  ``CUDECOMP_TPU_LOCAL_PERMUTE`` in
    {auto, xla, pallas, mixed}; auto selects mixed on TPU meshes.
    """
    import os
    val = os.environ.get("CUDECOMP_TPU_LOCAL_PERMUTE", "auto")
    if val in ("xla", "pallas", "mixed"):
        return val
    from cudecomp_tpu.ops.pallas_kernels import _mesh_platform
    return "mixed" if _mesh_platform(grid.mesh) == "tpu" else "xla"


# ops whose net permute runs the Pallas kernel under the 'mixed' rule:
# X2Y (ax=0,dir=+1) and Z2Y (ax=2,dir=-1).  Their successors in the
# canonical FFT cycle (Y2Z, Y2X) take the XLA permute, which absorbs the
# otherwise-unavoidable sublane-regroup pass between two same-direction
# Pallas kernels.
_MIXED_PALLAS_OPS = frozenset({(0, +1), (2, -1)})


def _net_perm(cfg, ax: int, dir_: int):
    """NET local permutation a communication-free transpose performs:
    input mem order -> output mem order, composed into one transpose."""
    in_inv = cfg.inv_mem_order(ax)
    out_order = cfg.mem_order(ax + dir_)
    return tuple(in_inv[o] for o in out_order)


@lru_cache(maxsize=512)
def _build_transpose_fn(grid, ax: int, dir_: int, in_halo, out_halo,
                        in_pad, out_pad, method_key: str, n_comp_dims: int,
                        permute_impl: str = "xla"):
    """Build (and cache) the jitted shard_map program for one transpose
    configuration.

    This is the analog of the reference's CUDA-graph cache
    (``include/internal/graph.h:37-51``, keyed on pointers/axis/dir/pencil
    infos/dtype): repeated eager calls with the same configuration reuse the
    compiled program instead of re-tracing — without it, every eager
    transpose would re-trace, since shard_map caches on callable identity.
    """
    cfg = grid.config
    ax_out = ax + dir_

    comm_pd = geometry.shard_pdim_of_dim(ax_out, ax)
    comm_name = grid.comm_axis_name(ax, dir_)
    P = cfg.pdims[comm_pd]

    in_order = cfg.mem_order(ax)
    out_order = cfg.mem_order(ax_out)
    in_inv = cfg.inv_mem_order(ax)
    ms_in = geometry.max_splits(cfg, ax)

    # scatter dim: full in input, sharded in output; gather dim: vice versa.
    scatter_dim, gather_dim = ax, ax_out
    splits_scatter = geometry._dist_splits(cfg, scatter_dim, P)
    splits_gather = geometry._dist_splits(cfg, gather_dim, P)
    if min(splits_scatter) == 0 or min(splits_gather) == 0:
        # reference rejects empty pencils (transpose.h:257-259)
        raise ValueError(
            f"transpose axis {ax}->{ax_out}: empty pencil (splits "
            f"{splits_scatter} / {splits_gather}); reduce pdims")
    off_scatter = geometry.get_split_offsets(
        cfg.effective_gdims_dist[scatter_dim], P)
    Bs = max(splits_scatter)           # == max_splits(out)[scatter_dim]
    Bg = max(splits_gather)            # == ms_in[gather_dim]
    even = (splits_scatter == (Bs,) * P) and (splits_gather == (Bg,) * P)

    pipelined = method_key == "ring_pipelined"
    if not pipelined:
        exchange = EXCHANGES[method_key]
        if method_key == "pallas_a2a":
            exchange = partial(exchange, mesh=grid.mesh)
        elif method_key == "ring_hier":
            from cudecomp_tpu.parallel.mesh import axis_group_size
            exchange = partial(exchange,
                               group=axis_group_size(grid.mesh, comm_name))

    comp_axes = tuple(range(3, 3 + n_comp_dims))

    # -- per-peer pipelined path (transpose.h:683-744 analog) ----------------
    # Step s slices peer (me+s)'s chunk straight from the input buffer (no
    # permute: sends start immediately), ppermutes it, and unpacks the chunk
    # received from peer (me-s) with ONE fused permute directly into the
    # output layout.  Chunk s+1's slice and chunk s-1's unpack permute have
    # no data dependence on chunk s's transfer, so XLA's latency-hiding
    # scheduler overlaps local permute work with ICI transfers — the
    # software pipeline the reference builds with per-peer CUDA events
    # (transpose.h:683-744, comm_routines.h:427-631).
    #
    # Non-divisible extents (arbitrary per-peer counts, the reference's
    # pipelined alltoallv, comm_routines.h:427-631) ride the same ring at
    # the uniform pad-to-max chunk size Bs: chunks are sliced at each
    # peer's scatter offset (the ragged tail reads pre-padded rows), and
    # the received chunk is masked to the sender's valid gather width and
    # accumulated into the output at the sender's gather offset — masked
    # lanes add zero, so the disjoint valid intervals assemble exactly.
    ms_out = geometry.max_splits(cfg, ax_out)
    pos_sc_in = in_order.index(scatter_dim)
    pos_g_out = out_order.index(gather_dim)
    pos_sc_out = out_order.index(scatter_dim)
    off_gather = geometry.get_split_offsets(
        cfg.effective_gdims_dist[gather_dim], P)
    # unpack permute: input-order chunk dims -> output-order dims, composed
    # into a single transpose (out dim j holds global axis out_order[j])
    perm_unpack = tuple(in_inv[out_order[j]] for j in range(3)) + comp_axes

    def pipelined_fn(t):
        me = lax.axis_index(comm_name)
        interior = tuple(ms_out[out_order[i]] for i in range(3))

        if even:
            out = jnp.zeros(interior + t.shape[3:], t.dtype)

            def chunk_for(peer):
                return lax.dynamic_slice_in_dim(t, peer * Bs, Bs,
                                                axis=pos_sc_in)

            def unpack(blk, recv_peer, acc):
                c = jnp.transpose(blk, perm_unpack)
                return lax.dynamic_update_slice_in_dim(
                    acc, c, recv_peer * Bg, axis=pos_g_out)

            out = unpack(chunk_for(me), me, out)
            for s in range(1, P):
                send = chunk_for((me + s) % P)
                perm = [(j, (j + s) % P) for j in range(P)]
                recv = lax.ppermute(send, comm_name, perm)
                out = unpack(recv, (me - s) % P, out)
            return out

        # uneven: pad the scatter dim so every offset+Bs slice is in
        # bounds (one static pad, before any send)
        pad_sc = off_scatter[P - 1] + Bs - t.shape[pos_sc_in]
        if pad_sc > 0:
            pw = [(0, 0)] * t.ndim
            pw[pos_sc_in] = (0, pad_sc)
            t = jnp.pad(t, pw)
        offs_sc = jnp.asarray(off_scatter, jnp.int32)
        offs_g = jnp.asarray(off_gather, jnp.int32)
        sg = jnp.asarray(splits_gather, jnp.int32)
        g_full = interior[pos_g_out]           # == sum(splits_gather)
        g_pad = off_gather[P - 1] + Bg - g_full
        acc_shape = list(interior)
        acc_shape[pos_g_out] += max(g_pad, 0)
        out = jnp.zeros(tuple(acc_shape) + t.shape[3:], t.dtype)

        def chunk_for(peer):
            return lax.dynamic_slice_in_dim(t, offs_sc[peer], Bs,
                                            axis=pos_sc_in)

        def unpack(blk, recv_peer, acc):
            c = jnp.transpose(blk, perm_unpack)
            iota = lax.broadcasted_iota(jnp.int32, c.shape, pos_g_out)
            c = jnp.where(iota < sg[recv_peer], c,
                          jnp.zeros((), c.dtype))
            cur = lax.dynamic_slice_in_dim(acc, offs_g[recv_peer], Bg,
                                           axis=pos_g_out)
            return lax.dynamic_update_slice_in_dim(
                acc, cur + c, offs_g[recv_peer], axis=pos_g_out)

        out = unpack(chunk_for(me), me, out)
        for s in range(1, P):
            send = chunk_for((me + s) % P)
            perm = [(j, (j + s) % P) for j in range(P)]
            recv = lax.ppermute(send, comm_name, perm)
            out = unpack(recv, (me - s) % P, out)
        if g_pad > 0:
            out = lax.slice_in_dim(out, 0, g_full, axis=pos_g_out)
        # pad-to-max scatter rows carry zeros (block-path parity): the
        # ragged chunk tails hold a neighbor's rows, masked off here
        ssc = jnp.asarray(splits_scatter, jnp.int32)
        iota_sc = lax.broadcasted_iota(jnp.int32, out.shape, pos_sc_out)
        return jnp.where(iota_sc < ssc[me], out, jnp.zeros((), out.dtype))

    def local_fn(local):
        t = _strip_halos_padding(local, in_order, in_halo, ms_in)

        if pipelined and P > 1:
            out_t = pipelined_fn(t)
            return _add_halos_padding(out_t, out_order, out_halo, out_pad)

        if P == 1:
            # slab degeneration: no collective, and the two layout
            # transposes (to global order, then to output order) compose
            # into ONE net permutation — dispatched to the one-pass Pallas
            # kernel on TPU meshes (see _local_permute_impl)
            net = _net_perm(cfg, ax, dir_) + comp_axes
            use_pallas = (permute_impl == "pallas"
                          or (permute_impl == "mixed"
                              and (ax, dir_) in _MIXED_PALLAS_OPS))
            if net == tuple(range(t.ndim)):
                out_t = t
            elif (use_pallas and t.ndim == 3
                  and not jnp.issubdtype(t.dtype, jnp.complexfloating)):
                from cudecomp_tpu.ops.pallas_kernels import (
                    pallas_cyclic_permute)
                out_t = pallas_cyclic_permute(t, net, force=True)
            else:
                out_t = jnp.transpose(t, axes=net)
            return _add_halos_padding(out_t, out_order, out_halo, out_pad)

        # to global-axis order (dims = X, Y, Z extents of this pencil)
        t = jnp.transpose(t, axes=in_inv + comp_axes)

        # ---- pack: chunk the scatter dim into per-peer blocks ----
        tm = jnp.moveaxis(t, scatter_dim, 0)
        if even:
            blocks = tm  # (P*Bs, ...) already contiguous per peer
        else:
            chunks = []
            for p in range(P):
                c = lax.slice_in_dim(tm, off_scatter[p],
                                     off_scatter[p] + splits_scatter[p],
                                     axis=0)
                if splits_scatter[p] < Bs:
                    padw = [(0, 0)] * c.ndim
                    padw[0] = (0, Bs - splits_scatter[p])
                    c = jnp.pad(c, padw)
                chunks.append(c)
            blocks = jnp.concatenate(chunks, axis=0)
        # ---- exchange over the mesh axis ----
        recv = exchange(blocks, comm_name, P, Bs)
        # ---- unpack: reassemble the gather dim ----
        # position of the gather dim after moveaxis(scatter -> 0):
        gpos = gather_dim + 1 if gather_dim < scatter_dim else gather_dim
        if even:
            out_m = _concat_gather_even(recv, P, Bs, Bg, gpos)
        else:
            parts = []
            for q in range(P):
                blk = lax.slice_in_dim(recv, q * Bs, (q + 1) * Bs, axis=0)
                blk = lax.slice_in_dim(blk, 0, splits_gather[q], axis=gpos)
                parts.append(blk)
            out_m = jnp.concatenate(parts, axis=gpos)
        out_t = jnp.moveaxis(out_m, 0, scatter_dim)

        out_t = jnp.transpose(out_t, axes=out_order + comp_axes)
        return _add_halos_padding(out_t, out_order, out_halo, out_pad)

    comp_spec = (None,) * n_comp_dims
    in_spec = jax.sharding.PartitionSpec(*(tuple(grid.spec(ax)) + comp_spec))
    out_spec = jax.sharding.PartitionSpec(
        *(tuple(grid.spec(ax_out)) + comp_spec))
    fn = shard_map_fn(local_fn, grid.mesh, in_specs=(in_spec,),
                      out_specs=out_spec)
    return jax.jit(fn)


def _transpose_impl(grid, arr, ax: int, dir_: int,
                    input_halo_extents, output_halo_extents,
                    input_padding, output_padding,
                    method: Optional[TransposeMethod]):
    cfg = grid.config
    ax_out = ax + dir_
    assert 0 <= ax_out <= 2
    in_halo = _check_extents(input_halo_extents, "input_halo_extents")
    out_halo = _check_extents(output_halo_extents, "output_halo_extents")
    in_pad = _check_extents(input_padding, "input_padding")
    out_pad = _check_extents(output_padding, "output_padding")
    if method is None:
        method = cfg.transpose_method
    method_key = (method.value if isinstance(method, TransposeMethod)
                  else str(method))
    if method_key not in EXCHANGES and method_key != "ring_pipelined":
        public = [k for k in EXCHANGES if not k.startswith("_")]
        raise ValueError(
            f"unknown transpose method {method_key!r}; available: "
            f"{sorted(public) + ['ring_pipelined']}")

    expected_in = geometry.global_buffer_shape(cfg, ax, in_halo, in_pad)
    if arr.ndim < 3 or tuple(arr.shape[:3]) != expected_in:
        raise ValueError(
            f"transpose {ax}->{ax_out}: input shape {tuple(arr.shape)} does "
            f"not match pencil-{('x','y','z')[ax]} layout {expected_in} "
            f"(halos {in_halo}, padding {in_pad}; trailing component dims "
            f"are allowed)")

    fn = _build_transpose_fn(grid, ax, dir_, in_halo, out_halo, in_pad,
                             out_pad, method_key, arr.ndim - 3,
                             permute_impl=_local_permute_impl(grid))

    names = ("x", "y", "z")
    op_name = f"transpose_{names[ax]}_to_{names[ax_out]}"
    comm_pd = geometry.shard_pdim_of_dim(ax_out, ax)
    P = cfg.pdims[comm_pd]
    ms_in = geometry.max_splits(cfg, ax)

    def perf_key():
        # per-chip a2a payload: everything but the self block leaves the chip
        local_elems = ms_in[0] * ms_in[1] * ms_in[2]  # per-shard interior
        nbytes = int(local_elems * arr.dtype.itemsize * (P - 1) / P)
        key = (op_name, cfg.gdims, cfg.pdims, method_key, str(arr.dtype),
               in_halo, out_halo, in_pad, out_pad)
        return key, nbytes

    from cudecomp_tpu import performance as perf
    with trace_range(f"cudecomp_tpu.{op_name}"):
        return perf.maybe_record(perf_key, fn, arr)


def _concat_gather_even(recv, P, Bs, Bg, gpos):
    """Evenly-divisible unpack: (P*Bs, ..., Bg, ...) -> (Bs, ..., P*Bg, ...)
    as pure reshapes so XLA fuses it into the collective's epilogue."""
    shape = recv.shape
    r = recv.reshape((P, Bs) + shape[1:])   # gather dim now at gpos + 1
    r = jnp.moveaxis(r, 0, gpos)            # (Bs, ..., P, Bg, ...)
    new_shape = list(r.shape)
    new_shape[gpos:gpos + 2] = [P * Bg]
    return r.reshape(new_shape)


def _public(ax, dir_):
    names = ("x", "y", "z")

    def op(grid, arr, input_halo_extents=None, output_halo_extents=None,
           input_padding=None, output_padding=None, method=None):
        return _transpose_impl(grid, arr, ax, dir_,
                               input_halo_extents, output_halo_extents,
                               input_padding, output_padding, method)

    op.__name__ = f"transpose_{names[ax]}_to_{names[ax + dir_]}"
    op.__doc__ = (
        f"Global transpose {names[ax].upper()}-pencil -> "
        f"{names[ax + dir_].upper()}-pencil (analog of "
        f"cudecompTranspose{names[ax].upper()}To{names[ax + dir_].upper()}, "
        f"include/cudecomp.h). Jittable; accepts per-op input/output halo "
        f"extents and padding.")
    return op


transpose_x_to_y = _public(0, +1)
transpose_y_to_z = _public(1, +1)
transpose_y_to_x = _public(1, -1)
transpose_z_to_y = _public(2, -1)
