"""Pallas TPU kernel: bands-resident multi-apply banded SpMV.

Chases the `bench.py` bands-resident roofline (VERDICT r2 weak #3): the
repeated-apply access pattern u ← c·(A u) re-reads the 3 band vectors from
HBM every apply on the XLA path (5 arrays of d·n per apply → the 819 GB/s
"stream" bound, ~160 Gnnz/s measured). This kernel holds ONE FACTOR'S bands
AND its working vector in VMEM across all m applies:

  grid = (d, m); bands BlockSpec index is constant along the apply axis, so
  Mosaic fetches each factor's (nb, n) band block once; the vector ping-pongs
  between two VMEM scratch buffers with an H-padded layout (no shifts — the
  stencil reads static slices of the padded buffer, the same trick as
  banded_spmv.py). HBM traffic per factor for m applies: bands once + v in
  once + u out once — O(1/m) of the stream traffic, which moves the kernel
  from HBM-bandwidth-bound to VPU-compute-bound.

This matches the solver's real access pattern in the sense the bench
defines (dependent applies with the operator fixed); the Lanczos step
proper interleaves reductions and is measured separately
(benchmarks/fused_step_bench.py).

Constraints: f32, v (d, n) with n % 128 == 0, per-factor VMEM footprint
(nb+3)·n·4 B ≲ 100 MB. Falls back to the XLA scan otherwise.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import KroneckerSumOperator

__all__ = ["spmv_multi_apply", "spmv_multi_apply_xla"]

_HP = 128  # halo padding, lane-aligned


def _kernel(bands_ref, v_ref, out_ref, buf0, buf1, *, offsets, n, m, scale):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        # zero the pads once per factor; the center is overwritten each apply
        buf0[...] = jnp.zeros_like(buf0)
        buf1[...] = jnp.zeros_like(buf1)
        buf0[:, _HP:_HP + n] = v_ref[...]

    def apply(src_ref, dst_ref):
        acc = None
        for b, off in enumerate(offsets):
            sl = src_ref[:, _HP + off:_HP + off + n]
            term = bands_ref[b:b + 1, :] * sl
            acc = term if acc is None else acc + term
        dst_ref[:, _HP:_HP + n] = acc * scale

    @pl.when(j % 2 == 0)
    def _():
        apply(buf0, buf1)

    @pl.when(j % 2 == 1)
    def _():
        apply(buf1, buf0)

    @pl.when(j == m - 1)
    def _():
        # result of apply j lives in buf1 when j is even, buf0 when odd;
        # m is static so the source is statically known
        src = buf1 if (m - 1) % 2 == 0 else buf0
        out_ref[...] = src[:, _HP:_HP + n]


@functools.partial(jax.jit, static_argnames=("offsets", "m", "scale"))
def _multi_apply(bands, v, offsets: Tuple[int, ...], m: int, scale: float):
    """One pallas_call PER FACTOR (Mosaic requires block dims to be
    (8,128)-divisible or full-array — a (1, n) slice of a (d, n) array is
    neither, so the factor axis cannot ride the grid); the m applies are
    the grid, over which bands and the ping-pong vector stay VMEM-resident."""
    d, nb, n = bands.shape
    kernel = functools.partial(
        _kernel, offsets=offsets, n=n, m=m, scale=float(scale)
    )
    outs = []
    # x64 disabled at trace time: Pallas index math must stay int32 for
    # Mosaic (same constraint as banded_spmv.py)
    with jax.enable_x64(False):
        for s in range(d):
            outs.append(pl.pallas_call(
                kernel,
                grid=(m,),
                in_specs=[
                    pl.BlockSpec((nb, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, n), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, n), v.dtype),
                scratch_shapes=[
                    pltpu.VMEM((1, n + 2 * _HP), v.dtype),
                    pltpu.VMEM((1, n + 2 * _HP), v.dtype),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(bands[s], v[s:s + 1]))
    return jnp.concatenate(outs, axis=0)


def spmv_multi_apply_xla(op: KroneckerSumOperator, v: jax.Array, m: int,
                         scale: float = 1.0) -> jax.Array:
    """XLA reference path: lax.scan of m dependent applies (the bench's
    original measurement loop)."""
    from ..banded import spmv

    c = jnp.asarray(scale, v.dtype)

    def body(x, _):
        return spmv(op, x) * c, ()

    out, _ = jax.lax.scan(body, v, None, length=m)
    return out


def spmv_multi_apply(op: KroneckerSumOperator, v: jax.Array, m: int,
                     scale: float = 1.0) -> jax.Array:
    """u ← scaleᵐ·Aᵐ v via the bands-resident kernel (fallback: XLA scan)."""
    d, nb, n = op.bands.shape
    H = max((abs(o) for o in op.offsets), default=0)
    vmem_bytes = (nb + 3) * n * 4
    if (
        v.ndim != 2 or v.dtype != jnp.float32 or op.bands.dtype != jnp.float32
        or n % 128 != 0 or H > _HP or vmem_bytes > 100 * 1024 * 1024
        or op.halo is not None
    ):
        return spmv_multi_apply_xla(op, v, m, scale)
    return _multi_apply(op.bands, v, op.offsets, m, float(scale))
