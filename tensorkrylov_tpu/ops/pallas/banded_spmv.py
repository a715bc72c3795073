"""Pallas TPU kernel: batched banded (DIA) SpMV.

Single-pass stencil over HBM: each grid step loads one (band-tile, v-tile)
pair into VMEM and emits one output tile. The v tile is fetched with a
2·H-element halo by a manually pipelined (double-buffered) DMA — BlockSpecs
cannot express overlapping windows. Band tiles and output tiles ride the
automatic Pallas pipeline.

This is hot kernel #1 (the reference's per-factor sparse mul!,
/root/reference/src/orthogonal_bases.jl:20,45) at single-chip
speed-of-light: the op is HBM-bandwidth-bound — (nb+2)·4 bytes moved per
nb nnz.

Requires n % tile == 0 (the caller pads); v is pre-padded with H zeros on
both sides so edge tiles need no masking (out-of-range band entries are
stored as zero).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import KroneckerSumOperator

__all__ = ["spmv_pallas"]


_HPAD = 128  # halo padding rounded to the lane tiling (DMA sizes must be 128-aligned)


def _kernel(bands_ref, vpad_hbm, out_ref, vbuf, sems, *, offsets, TN, n_tiles):
    # one grid step = one tile of ALL d factor rows (d rides the sublane dim)
    ti = pl.program_id(0)

    def get_dma(slot, tile):
        # explicit i32 starts: under jax_enable_x64 python-int index math
        # lowers to int64, which Mosaic cannot convert (infinite recursion
        # in _convert_helper)
        start = jnp.asarray(tile, jnp.int32) * TN
        return pltpu.make_async_copy(
            vpad_hbm.at[:, pl.ds(start, TN + 2 * _HPAD)],
            vbuf.at[jnp.asarray(slot, jnp.int32)],
            sems.at[jnp.asarray(slot, jnp.int32)],
        )

    cur = ti % 2
    nxt = (ti + 1) % 2

    @pl.when(ti == 0)
    def _():
        get_dma(0, 0).start()

    # prefetch next tile's v while computing this one
    @pl.when(ti + 1 < n_tiles)
    def _():
        get_dma(nxt, ti + 1).start()

    get_dma(cur, ti).wait()

    acc = None
    for b, off in enumerate(offsets):
        shifted = vbuf[cur, :, _HPAD + off : _HPAD + off + TN]
        term = bands_ref[:, b, :] * shifted
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "tile"))
def _spmv_pallas(bands, v, offsets: Tuple[int, ...], tile: int):
    d, nb, n = bands.shape
    n_tiles = n // tile
    vpad = jnp.pad(v, ((0, 0), (_HPAD, _HPAD)))

    kernel = functools.partial(_kernel, offsets=offsets, TN=tile, n_tiles=n_tiles)
    # x64 disabled at kernel-trace time: with jax_enable_x64 on, Pallas'
    # internal index arithmetic produces int64 scalars Mosaic cannot lower
    with jax.enable_x64(False):
        return _call(kernel, bands, vpad, d, nb, n, tile, n_tiles, v.dtype)


def _call(kernel, bands, vpad, d, nb, n, tile, n_tiles, dtype):
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d, nb, tile), lambda ti: (0, 0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, d, tile + 2 * _HPAD), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(bands, vpad)


def spmv_pallas(op: KroneckerSumOperator, v: jax.Array, tile: int = 8 * 1024) -> jax.Array:
    """Pallas-kernel SpMV; falls back shape requirements to the jnp path.

    v: (d, n). For (d, m, n) block vectors use ops.banded.spmv (the XLA path
    handles those well already).
    """
    n = op.n
    H = max((abs(o) for o in op.offsets), default=0)
    if v.ndim != 2 or n % tile != 0 or H > _HPAD:
        from ..banded import spmv as spmv_jnp

        return spmv_jnp(op, v)
    return _spmv_pallas(op.bands, v, op.offsets, tile)
