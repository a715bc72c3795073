"""Pallas TPU kernel: VMEM-resident multi-STEP Lanczos (VERDICT r3 #2).

The r3 bands-resident multi-APPLY kernel (resident_spmv.py) hit 800 Gnnz/s
but was a microbench the solver never executed — the production step
interleaves reductions, and one-step-per-call fused kernels lose to XLA
(HBM-bound: every call re-reads vp/vpp and re-writes u). This kernel runs
S COMPLETE Lanczos steps per pallas_call with everything resident:

  per factor, the bands and three ring working vectors live in VMEM for
  all S steps (S statically unrolled — r5: the r4 grid=(S,) version's
  per-step (1, n) output block violated Mosaic's (8, 128) tiling rule and
  NEVER compiled on hardware; the bench silently recorded 0.0 until the
  r5 stderr fix surfaced the rejection). Per step, entirely on-chip:
      u     = A vp − β·vpp            (stencil on the padded buffer)
      α     = Σ u·vp                  (VPU reduction, no HBM)
      u    −= α·vp
      β'    = sqrt(Σ u²)
      v_k   = u / β'
  and only the finished basis columns leave to HBM as one (S, n) block.
  Traffic per step: ONE column write — vs the XLA path's ~5 d·n arrays.

Large S is split into VMEM-sized sub-calls internally (the (S, n) output
block must fit the ~100 MB VMEM budget next to the bands + ring buffers);
the recurrence carries (vp, vpp, β) chain across sub-calls exactly.

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
_VMEM_BUDGET = 128 * 1024 * 1024


def _kernel(bands_ref, vp_ref, vpp_ref, beta_ref,
            vout_ref, ab_ref, vp_out, vpp_out, beta_out,
            b0, b1, b2, bsc, *, offsets, n, S):
    b0[...] = jnp.zeros_like(b0)
    b1[...] = jnp.zeros_like(b1)
    b2[...] = jnp.zeros_like(b2)
    b0[:, _HP:_HP + n] = vpp_ref[...]
    b1[:, _HP:_HP + n] = vp_ref[...]
    bsc[0, 0] = beta_ref[0, 0]
    bufs = (b0, b1, b2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for step in range(S):          # static unroll: every ref write static
        vpp_buf = bufs[step % 3]
        vp_buf = bufs[(step + 1) % 3]
        u_buf = bufs[(step + 2) % 3]
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
        u_buf[...] = jnp.zeros_like(u_buf)
        u_buf[:, _HP:_HP + n] = v_new
        vout_ref[step:step + 1, :] = v_new
        bn = jnp.where(ok, beta_new, 0.0)
        ab_ref[step:step + 1, :] = jnp.where(
            lane == 0, alpha, jnp.where(lane == 1, bn, 0.0))
        bsc[0, 0] = bn

    vp_out[...] = bufs[(S + 1) % 3][:, _HP:_HP + n]
    vpp_out[...] = bufs[S % 3][:, _HP:_HP + n]
    beta_out[...] = jnp.full((1, 128), bsc[0, 0], jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "S"))
def _resident_steps_chunk(bands, vp, vpp, beta, offsets: Tuple[int, ...],
                          S: int):
    d, nb, n = bands.shape
    kernel = functools.partial(_kernel, offsets=offsets, n=n, S=S)
    Vs, As, Bs, vps, vpps, betas = [], [], [], [], [], []
    with jax.enable_x64(False):
        for s in range(d):
            V, ab, vpn, vppn, bn = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
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
                    vmem_limit_bytes=_VMEM_BUDGET,
                ),
            )(bands[s], vp[s:s + 1], vpp[s:s + 1],
              beta[s].reshape(1, 1).astype(jnp.float32))
            Vs.append(V)
            As.append(ab[:, 0])
            Bs.append(ab[:, 1])
            vps.append(vpn)
            vpps.append(vppn)
            betas.append(bn[0, 0])
    # per-factor tuples OUT of the jit: an in-jit concatenate of the d
    # (S, n) outputs fused into an 88 MB scoped-vmem allocation and the
    # compiler refused (16 MB fusion limit) — the caller stacks eagerly
    return tuple(Vs), tuple(As), tuple(Bs), tuple(vps), tuple(vpps), \
        tuple(betas)


def _stack_chunk(out):
    # barrier: under an OUTER jit (solve_host_projected's segment update)
    # XLA fuses the d pallas custom-calls with the stack below into one
    # kCustom fusion whose scoped-vmem allocation is the full (d, S, n)
    # stack (89 MB vs the 16 MB fusion limit — measured refusal). The
    # barrier materializes the per-factor outputs to HBM first.
    out = jax.lax.optimization_barrier(out)
    Vs, As, Bs, vps, vpps, betas = out
    return (
        jnp.stack(Vs, 1),                              # (S, d, n)
        jnp.stack(As, 0),                              # (d, S) alpha
        jnp.stack(Bs, 0),                              # (d, S) beta
        jnp.concatenate(vps, 0),                       # (d, n)
        jnp.concatenate(vpps, 0),                      # (d, n)
        jnp.stack(betas, 0),                           # (d,)
    )


def _max_chunk(nb: int, n: int) -> int:
    """Largest S whose (S, n) output block + bands + ring buffers fit the
    VMEM budget (~45% headroom for Mosaic temporaries), capped at 8: the
    statically-unrolled kernel's Mosaic compile costs ~35 s per unrolled
    step per factor on this backend (S=8, d=8 measured 268 s cold), so one
    cached S=8 program serves every caller instead of a compile per S."""
    fixed = (nb + 3) * (n + 2 * _HP) * 4
    avail = int(0.55 * _VMEM_BUDGET) - fixed
    return max(1, min(8, avail // (n * 4)))


def _resident_steps(bands, vp, vpp, beta, offsets: Tuple[int, ...], S: int):
    d, nb, n = bands.shape
    chunk = min(S, _max_chunk(nb, n))
    outs = []
    s0 = 0
    while s0 < S:
        sc = min(chunk, S - s0)
        out = _stack_chunk(
            _resident_steps_chunk(bands, vp, vpp, beta, offsets, sc))
        outs.append(out[:3])
        vp, vpp, beta = out[3], out[4], out[5]
        s0 += sc
    if len(outs) == 1:
        return outs[0][0], outs[0][1], outs[0][2], vp, vpp, beta
    V = jnp.concatenate([o[0] for o in outs], axis=0)
    al = jnp.concatenate([o[1] for o in outs], axis=1)
    bt = jnp.concatenate([o[2] for o in outs], axis=1)
    return V, al, bt, vp, vpp, beta


def lanczos_resident_supported(op: KroneckerSumOperator) -> bool:
    d, nb, n = op.bands.shape
    H = max((abs(o) for o in op.offsets), default=0)
    return (op.bands.dtype == jnp.float32 and n % 128 == 0 and H <= _HP
            and (nb + 4) * n * 4 <= _VMEM_BUDGET and op.halo is None)


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
