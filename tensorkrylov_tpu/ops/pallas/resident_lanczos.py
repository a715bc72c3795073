"""Pallas TPU kernel: VMEM-resident multi-STEP Lanczos (VERDICT r3 #2).

The r3 bands-resident multi-APPLY kernel (resident_spmv.py) hit 800 Gnnz/s
but was a microbench the solver never executed — the production step
interleaves reductions, and one-step-per-call fused kernels lose to XLA
(HBM-bound: every call re-reads vp/vpp and re-writes u). This kernel runs
S COMPLETE Lanczos steps per pallas_call with everything resident:

  grid = (S,); per factor, the bands and the three working vectors live in
  VMEM across all S steps. Per step, entirely on-chip:
      u     = A vp − β·vpp            (stencil on the padded buffer)
      α     = Σ u·vp                  (VPU reduction, no HBM)
      u    −= α·vp
      β'    = sqrt(Σ u²)
      v_k   = u / β'
  and only the finished basis column v_k (n·4 bytes) leaves to HBM.
  Traffic per step: ONE column write — vs the XLA path's ~5 d·n arrays —
  so the step is VPU-compute-bound like the multi-apply bench, but now it
  is the SOLVER'S OWN LOOP (the exact recurrence of twopass pass-1/pass-2
  between deflation projections, ops/orth.py:lanczos_step's plain mode).

f32 (estimate-grade: docs/northstar.md §4 — certifying runs use the df64
recording path). Breakdown guard: β' < 1e-30 freezes the recurrence with
zero columns (matching deflate.py's inert-zero convention).

Constraints: f32, n % 128 == 0, per-factor VMEM (nb+4)·n·4 ≲ 100 MB;
otherwise callers fall back to the XLA step loop.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import KroneckerSumOperator

__all__ = ["lanczos_resident_steps", "lanczos_resident_supported"]

_HP = 128  # halo padding, lane-aligned


def _kernel(bands_ref, vp_ref, vpp_ref, beta_ref,
            vout_ref, ab_ref, vp_out, vpp_out, beta_out,
            b0, b1, b2, bsc, *, offsets, n, S):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        b0[...] = jnp.zeros_like(b0)
        b1[...] = jnp.zeros_like(b1)
        b2[...] = jnp.zeros_like(b2)
        b0[:, _HP:_HP + n] = vpp_ref[...]
        b1[:, _HP:_HP + n] = vp_ref[...]
        bsc[0, 0] = beta_ref[0, 0]

    def step(vpp_buf, vp_buf, u_buf):
        beta = bsc[0, 0]
        acc = None
        for b, off in enumerate(offsets):
            sl = vp_buf[:, _HP + off:_HP + off + n]
            term = bands_ref[b:b + 1, :] * sl
            acc = term if acc is None else acc + term
        u = acc - beta * vpp_buf[:, _HP:_HP + n]
        vp = vp_buf[:, _HP:_HP + n]
        alpha = jnp.sum(u * vp)
        u = u - alpha * vp
        beta_new = jnp.sqrt(jnp.sum(u * u))
        ok = beta_new > 1e-30
        inv = jnp.where(ok, 1.0 / jnp.where(ok, beta_new, 1.0), 0.0)
        v_new = u * inv
        u_buf[:, _HP:_HP + n] = v_new
        vout_ref[...] = v_new
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        bn = jnp.where(ok, beta_new, 0.0)
        ab_ref[...] = jnp.where(lane == 0, alpha, jnp.where(lane == 1, bn, 0.0))
        bsc[0, 0] = bn

    @pl.when(j % 3 == 0)
    def _():
        step(b0, b1, b2)

    @pl.when(j % 3 == 1)
    def _():
        step(b1, b2, b0)

    @pl.when(j % 3 == 2)
    def _():
        step(b2, b0, b1)

    @pl.when(j == S - 1)
    def _():
        # after step j: vp = buf[(j+2)%3], vpp = buf[(j+1)%3]
        srcs = (b0, b1, b2)
        vp_out[...] = srcs[(S + 1) % 3][:, _HP:_HP + n]
        vpp_out[...] = srcs[S % 3][:, _HP:_HP + n]
        beta_out[...] = jnp.full((1, 128), bsc[0, 0], jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "S"))
def _resident_steps(bands, vp, vpp, beta, offsets: Tuple[int, ...], S: int):
    d, nb, n = bands.shape
    kernel = functools.partial(_kernel, offsets=offsets, n=n, S=S)
    Vs, As, Bs, vps, vpps, betas = [], [], [], [], [], []
    with jax.enable_x64(False):
        for s in range(d):
            V, ab, vpn, vppn, bn = pl.pallas_call(
                kernel,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((nb, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda j: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, n), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((S, n), jnp.float32),
                    jax.ShapeDtypeStruct((S, 128), jnp.float32),
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, 128), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((1, n + 2 * _HP), jnp.float32),
                    pltpu.VMEM((1, n + 2 * _HP), jnp.float32),
                    pltpu.VMEM((1, n + 2 * _HP), jnp.float32),
                    pltpu.SMEM((1, 1), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(bands[s], vp[s:s + 1], vpp[s:s + 1],
              beta[s].reshape(1, 1).astype(jnp.float32))
            Vs.append(V[None])
            As.append(ab[None, :, 0])
            Bs.append(ab[None, :, 1])
            vps.append(vpn)
            vpps.append(vppn)
            betas.append(bn[:1, 0])
    return (
        jnp.concatenate(Vs, 0).transpose(1, 0, 2),     # (S, d, n)
        jnp.concatenate(As, 0),                        # (d, S) alpha
        jnp.concatenate(Bs, 0),                        # (d, S) beta
        jnp.concatenate(vps, 0),                       # (d, n)
        jnp.concatenate(vpps, 0),                      # (d, n)
        jnp.concatenate(betas, 0),                     # (d,)
    )


def lanczos_resident_supported(op: KroneckerSumOperator) -> bool:
    d, nb, n = op.bands.shape
    H = max((abs(o) for o in op.offsets), default=0)
    return (op.bands.dtype == jnp.float32 and n % 128 == 0 and H <= _HP
            and (nb + 4) * n * 4 <= 100 * 1024 * 1024 and op.halo is None)


def lanczos_resident_steps(op: KroneckerSumOperator, vp, vpp, beta, S: int):
    """Run S complete plain-Lanczos steps VMEM-resident (f32).

    Returns (V (S, d, n) new basis columns, alpha (d, S), beta (d, S),
    vp', vpp', beta') — the same recurrence as ops/orth.py:lanczos_step's
    plain mode / deflate.py:_advance_light between projections, at
    resident-kernel throughput. Caller handles projections/reorth between
    calls (the project_every cadence)."""
    if not lanczos_resident_supported(op):
        raise ValueError("shapes/dtype unsupported — use the XLA step path "
                         "(lanczos_resident_supported(op) is False)")
    return _resident_steps(op.bands, vp.astype(jnp.float32),
                           vpp.astype(jnp.float32), beta, op.offsets, S)
