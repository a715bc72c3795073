"""Pallas TPU kernel: fused plain-Lanczos step (two HBM passes).

The reference performs one Lanczos step as five separate length-n
operations — sparse mul!, axpy(-beta), dot(alpha), axpy(-alpha),
norm/scale — each a full pass over memory
(/root/reference/src/orthogonal_bases.jl:39-67). XLA fuses some of the
elementwise chain, but the two serializing reductions (alpha before the
alpha-subtraction, beta before the normalization) split the step into
several kernels with repeated reads of u/v_prev, plus a separate pass for
the compressed-RHS entry b̃_k = <v_k, b>.

This module collapses the recurrence into exactly two stencil-shaped HBM
passes (the information-theoretic minimum given the two reductions):

  pass 1 (_k1): w = A v_prev − β v_prevprev      (banded stencil + axpy)
                α_part += w ∘ v_prev              (fused dot)
  pass 2 (_k2): u = w − α v_prev                  (axpy)
                β²_part += u ∘ u, ub_part += u ∘ b  (fused dots)

The normalization v_k = u/β and H/btil updates stay in XLA (they fuse into
the basis write). b̃_k is recovered as (u·b)/β — no third pass over n.

Per-factor HBM traffic for a tridiagonal factor drops from ~16·n elements
(XLA path, counting materialized u and re-reads around the reductions) to
(nb + 9)·n = 12·n, and the kernel count per iteration shrinks — which also
matters for dispatch-bound small-n solves.

The v_prev tile halo is NOT a manual overlapped DMA: Mosaic requires DMA
slice shapes 8-aligned in the sublane (d) dimension, which breaks odd d
(e.g. the d=10 flagship). Instead the kernel reads plain BlockSpec tiles
(automatically double-buffered) plus a tiny pre-gathered `edges` array
(n_tiles, d, 2·128) holding each tile's halo columns — O(n_tiles·d·256)
elements, negligible HBM traffic. Accumulators are (d, 128) lane-partial
sums reduced on the host side of the pallas_call (one tiny XLA reduce).

f32 compute only (TPU Pallas has no f64): used when the step's compute
dtype is f32 — i.e. f32 or bf16 basis storage (bf16 V is read in storage
dtype and promoted in-registers, keeping the bandwidth win). The f64 path
falls back to ops/orth.py's XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import KroneckerSumOperator

__all__ = ["fused_lanczos_core", "fused_tile"]

_HPAD = 128  # halo padding rounded to the lane tiling (DMA 128-alignment)


def _k1(bands_ref, v_ref, edges_ref, vpp_ref, beta_ref, w_ref, apart_ref, *, offsets, TN):
    ti = pl.program_id(0)
    f32 = jnp.float32
    # halo'd tile: [left halo (128) | center (TN) | right halo (128)] built
    # in-registers from the BlockSpec tile + this tile's pre-gathered edges
    vc = v_ref[:, :]
    vext = jnp.concatenate(
        [edges_ref[0, :, :_HPAD], vc, edges_ref[0, :, _HPAD:]], axis=-1
    )
    acc = None
    for bidx, off in enumerate(offsets):
        shifted = vext[:, _HPAD + off : _HPAD + off + TN].astype(f32)
        term = bands_ref[:, bidx, :].astype(f32) * shifted
        acc = term if acc is None else acc + term
    w = acc - beta_ref[:, 0:1].astype(f32) * vpp_ref[:, :].astype(f32)
    w_ref[:, :] = w

    d = w.shape[0]
    part = jnp.sum((w * vc.astype(f32)).reshape(d, TN // 128, 128), axis=1)

    @pl.when(ti == 0)
    def _():
        apart_ref[:, :] = jnp.zeros_like(apart_ref)

    apart_ref[:, :] += part


def _k2(w_ref, vp_ref, b_ref, alpha_ref, u_ref, b2_ref, ub_ref, *, TN):
    ti = pl.program_id(0)
    f32 = jnp.float32
    u = w_ref[:, :] - alpha_ref[:, 0:1].astype(f32) * vp_ref[:, :].astype(f32)
    u_ref[:, :] = u
    d = u.shape[0]
    b2 = jnp.sum((u * u).reshape(d, TN // 128, 128), axis=1)
    ub = jnp.sum((u * b_ref[:, :].astype(f32)).reshape(d, TN // 128, 128), axis=1)

    @pl.when(ti == 0)
    def _():
        b2_ref[:, :] = jnp.zeros_like(b2_ref)
        ub_ref[:, :] = jnp.zeros_like(ub_ref)

    b2_ref[:, :] += b2
    ub_ref[:, :] += ub


@functools.partial(jax.jit, static_argnames=("offsets", "tile"))
def _fused_core(bands, v_prev, v_pprev, beta, b, offsets: Tuple[int, ...], tile: int):
    d, nb, n = bands.shape
    n_tiles = n // tile
    f32 = jnp.float32
    if b.dtype == jnp.float64:  # Mosaic has no f64; f32/bf16 pass through
        b = b.astype(f32)

    # per-tile halo columns (tiny gather: n_tiles × d × 256 elements):
    # edges[t, :, :128]  = v_prev columns [t·TN−128, t·TN)  (zeros at t=0)
    # edges[t, :, 128:]  = v_prev columns [(t+1)·TN, +128)  (zeros at end)
    vpad = jnp.pad(v_prev, ((0, 0), (_HPAD, _HPAD)))
    starts = jnp.arange(n_tiles) * tile                       # tile origins
    il = starts[:, None] + jnp.arange(_HPAD)[None, :]         # left-halo cols (vpad idx)
    ir = starts[:, None] + tile + _HPAD + jnp.arange(_HPAD)[None, :]
    idx = jnp.concatenate([il, ir], axis=1)                   # (n_tiles, 256)
    edges = jnp.transpose(vpad[:, idx], (1, 0, 2))            # (n_tiles, d, 256)

    k1 = functools.partial(_k1, offsets=offsets, TN=tile)
    # x64 disabled at kernel-trace time: with jax_enable_x64 on (the solver's
    # projected algebra needs f64) Pallas' internal index arithmetic produces
    # int64 scalars that Mosaic cannot lower
    with jax.enable_x64(False):
        w, apart = _call_k1(k1, bands, v_prev, edges, v_pprev, beta, d, nb, n, tile, n_tiles)
    alpha = jnp.sum(apart, axis=1)

    k2 = functools.partial(_k2, TN=tile)
    with jax.enable_x64(False):
        u, b2p, ubp = _call_k2(k2, w, v_prev, b, alpha, d, n, tile, n_tiles)
    return u, alpha, jnp.sum(b2p, axis=1), jnp.sum(ubp, axis=1)


def _call_k1(k1, bands, v_prev, edges, v_pprev, beta, d, nb, n, tile, n_tiles):
    f32 = jnp.float32
    return pl.pallas_call(
        k1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d, nb, tile), lambda ti: (0, 0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 2 * _HPAD), lambda ti: (ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 128), lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, n), f32),
            jax.ShapeDtypeStruct((d, 128), f32),
        ],
    )(bands, v_prev, edges, v_pprev, beta.astype(f32)[:, None])


def _call_k2(k2, w, v_prev, b, alpha, d, n, tile, n_tiles):
    f32 = jnp.float32
    return pl.pallas_call(
        k2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda ti: (0, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 128), lambda ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 128), lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, n), f32),
            jax.ShapeDtypeStruct((d, 128), f32),
            jax.ShapeDtypeStruct((d, 128), f32),
        ],
    )(w, v_prev, b, alpha.astype(f32)[:, None])


def fused_tile(op: KroneckerSumOperator, n: int) -> Optional[int]:
    """Largest eligible tile width for the fused step, or None if the shapes
    rule the Pallas path out (caller then uses the XLA path)."""
    H = max((abs(o) for o in op.offsets), default=0)
    if H > _HPAD:
        return None
    for t in (8192, 4096, 2048, 1024, 512, 256, 128):
        if n % t == 0:
            return t
    return None


def fused_lanczos_core(op: KroneckerSumOperator, v_prev, v_pprev, beta, b, tile: int):
    """One fused plain-Lanczos recurrence core for all d factors.

    Args:
      op: operator (bands in the f32 compute dtype).
      v_prev, v_pprev: (d, n) basis columns k-1 / k-2 in STORAGE dtype
        (f32 or bf16 — promoted in-kernel).
      beta: (d,) previous subdiagonal (any float dtype).
      b: (d, n) right-hand side factors.
      tile: from fused_tile().

    Returns (u, alpha, beta_sq, ub), all f32:
      u: (d, n) unnormalized new direction (after alpha/beta subtraction),
      alpha = <A v_prev − β v_pprev, v_prev>, beta_sq = ‖u‖², ub = <u, b>.
    """
    return _fused_core(op.bands, v_prev, v_pprev, beta, b, op.offsets, tile)
