"""Pallas ring-halo banded SpMV — explicit inter-chip RDMA halo exchange.

The shard_map/ppermute path (parallel/halo.py) lets XLA schedule the halo
exchange; this kernel takes explicit control so the (latency-bound,
H ≤ 2-element) halo transfer rides ICI *concurrently* with the interior
stencil compute: each device starts two `make_async_remote_copy`s (its
128-lane edge slabs to each neighbour), computes the interior DIA
shift-multiply-accumulate while the RDMAs are in flight, then applies the
two 128-lane edge corrections after the receive semaphores fire.

This is the multi-host upgrade path for hot kernel #1 (the reference's
per-factor sparse mul!, /root/reference/src/orthogonal_bases.jl:20,45) —
the reference has no distributed execution at all (SURVEY.md §2.14).

Chain (non-periodic) semantics come for free: the ring wraps data to the
global edge devices, but the DIA convention stores zeros in out-of-range
band entries (types.py:KroneckerSumOperator), so wrapped contributions are
multiplied by zero.

Layout contract (per shard): bands (d, nb, nl), v (d, nl), nl % 128 == 0,
max |offset| ≤ 128. Use inside shard_map over a 1-D mode axis.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_ring_spmv", "ring_spmv_local"]

_EDGE = 128  # edge-slab width (lane-aligned RDMA granularity)


def _lane_mask(d: int, pred) -> jax.Array:
    """(d, _EDGE) f32-ish bool mask from a per-lane predicate."""
    j = jax.lax.broadcasted_iota(jnp.int32, (d, _EDGE), 1)
    return pred(j)


def _kernel(bands_ref, v_ref, out_ref, lhalo, rhalo, send_sem, recv_sem, *,
            offsets: Tuple[int, ...], axis_name: str):
    d, nb, nl = bands_ref.shape
    my = jnp.asarray(jax.lax.axis_index(axis_name), jnp.int32)
    nd = jnp.asarray(jax.lax.axis_size(axis_name), jnp.int32)
    right = jax.lax.rem(my + 1, nd)
    left = jax.lax.rem(my - 1 + nd, nd)

    # neighbour barrier: both sides must have entered the kernel (scratch
    # buffers live) before anyone writes into them remotely
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_wait(barrier, 2)

    # my last EDGE lanes → right neighbour's lhalo; my first EDGE lanes →
    # left neighbour's rhalo. Symmetric code: my lhalo/rhalo arrive from my
    # left/right neighbours, tracked by my recv semaphores.
    rdma_r = pltpu.make_async_remote_copy(
        src_ref=v_ref.at[:, nl - _EDGE :],
        dst_ref=lhalo,
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_l = pltpu.make_async_remote_copy(
        src_ref=v_ref.at[:, :_EDGE],
        dst_ref=rhalo,
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_r.start()
    rdma_l.start()

    # ---- interior compute, overlapped with the RDMAs ----
    v = v_ref[:, :]
    acc = None
    for b, off in enumerate(offsets):
        sh = pltpu.roll(v, (-off) % nl, axis=1) if off else v
        if off:
            # zero the wrapped lanes (true values arrive with the halos)
            j = jax.lax.broadcasted_iota(jnp.int32, (d, nl), 1)
            valid = (j < nl - off) if off > 0 else (j >= -off)
            sh = jnp.where(valid, sh, 0.0)
        term = bands_ref[:, b, :] * sh
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc

    rdma_r.wait()
    rdma_l.wait()

    # ---- edge corrections (one 128-lane tile per side) ----
    # tail, off > 0: row i ≥ nl−off needs v_next[i+off−nl] = rhalo[j+off−128]
    # on tile lane j = i−(nl−128) → roll(rhalo, 128−off), lanes j ≥ 128−off
    tail = None
    head = None
    for b, off in enumerate(offsets):
        if off > 0:
            corr = bands_ref[:, b, nl - _EDGE :] * jnp.where(
                _lane_mask(d, lambda j: j >= _EDGE - off),
                pltpu.roll(rhalo[:, :], (_EDGE - off) % _EDGE, axis=1),
                0.0,
            )
            tail = corr if tail is None else tail + corr
        elif off < 0:
            # head: row i < −off needs v_prev[nl+i+off] = lhalo[j+128+off]
            # → roll(lhalo, −(128+off)), lanes j < −off
            corr = bands_ref[:, b, :_EDGE] * jnp.where(
                _lane_mask(d, lambda j: j < -off),
                pltpu.roll(lhalo[:, :], (-(_EDGE + off)) % _EDGE, axis=1),
                0.0,
            )
            head = corr if head is None else head + corr
    if tail is not None:
        out_ref[:, nl - _EDGE :] = out_ref[:, nl - _EDGE :] + tail
    if head is not None:
        out_ref[:, :_EDGE] = out_ref[:, :_EDGE] + head


def ring_spmv_local(
    bands: jax.Array,
    offsets: Tuple[int, ...],
    v: jax.Array,
    axis_name: str,
    *,
    interpret=False,
    collective_id: int = 11,
):
    """Per-shard body (call inside shard_map): bands (d, nb, nl), v (d, nl)."""
    d, nb, nl = bands.shape
    kernel = functools.partial(_kernel, offsets=offsets, axis_name=axis_name)
    # x64 disabled at kernel-trace time: with jax_enable_x64 on, Pallas'
    # internal index arithmetic produces int64 scalars Mosaic cannot lower
    with jax.enable_x64(False):
        return _call(kernel, bands, v, d, interpret, collective_id)


def _call(kernel, bands, v, d, interpret, collective_id):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, _EDGE), v.dtype),
            pltpu.VMEM((d, _EDGE), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(bands, v)


def make_ring_spmv(
    mesh: Mesh,
    offsets: Tuple[int, ...],
    axis_name: str = "mode",
    *,
    interpret: Optional[object] = None,
):
    """Jitted shard_map ring-RDMA SpMV over `mesh`.

    fn(bands (d, nb, n), v (d, n)) → (d, n), last axis sharded over
    `axis_name`. `interpret`: pass pltpu.InterpretParams() to simulate the
    RDMAs on CPU (tests); None → compiled.

    Constraints: per-shard nl % 128 == 0, nl ≥ 128, max |offset| ≤ 128 —
    use parallel.halo.make_halo_spmv otherwise.
    """
    H = max((abs(o) for o in offsets), default=0)
    if H > _EDGE:
        raise ValueError(f"bandwidth {H} exceeds edge slab {_EDGE}")
    spec_b = P(None, None, axis_name)
    spec_v = P(None, axis_name)
    ipt = interpret if interpret is not None else False

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_b, spec_v),
        out_specs=spec_v,
        check_vma=False,
    )
    def fn(bands, v):
        nl = v.shape[-1]
        if nl % _EDGE != 0 or nl < _EDGE:
            raise ValueError(
                f"per-shard width {nl} must be a multiple of {_EDGE}"
            )
        return ring_spmv_local(bands, offsets, v, axis_name, interpret=ipt)

    return fn
