"""Light (basis-free / segmented) deflated-Lanczos machinery + pass-2.

Split out of deflate.py (VERDICT r4 #8): the O(d·n) twopass recurrence
state (_LightState), the segmented storage with boundary
reorthogonalization, and the pass-2 replay/accumulation (device and host)
with its orthonormality audit. The solve_deflated driver (deflate.py)
orchestrates these.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops.banded import spmv
from .ops.orth import bdot, deflation_project

class _LightState(NamedTuple):
    """Basis-free deflated-Lanczos state (storage='twopass'): the recurrence
    carries only the two live vectors — no (d, K, n) basis exists on device,
    which sidesteps the TPU AOT planner's multiplied accounting of big f64
    loop carries entirely and removes every memory ceiling on kmax.
    Auto-reorth is unavailable (no prefix to sweep); the measured v₀-drift
    probe (btil) quantifies the orthogonality slack instead."""

    dg: jax.Array    # (d, K)
    od: jax.Array    # (d, K)
    btil: jax.Array  # (d, K)
    vp: jax.Array    # (d, n)
    vpp: jax.Array   # (d, n)
    beta: jax.Array  # (d,)
    leak: jax.Array  # () max measured pre-projection U-leak max|Uᵀu|/‖u‖


def _project_with_leak(u, U, pdt):
    """deflation_project + the free leak telemetry max_s ‖U_sᵀ u_s‖∞/‖u_s‖.
    Chunked over U columns like ops.orth.deflation_project (bounds the TPU
    f64-emulation splat temp); the leak is the max |coefficient| over all
    chunks, relative to the pre-projection norm."""
    from .ops.orth import _proj_col_chunk

    Ua = U.astype(pdt)
    n, m = Ua.shape[1], Ua.shape[2]
    C = _proj_col_chunk(Ua.shape[0] * n, m)
    un = jnp.sqrt(bdot(u, u, pdt))
    wmax = jnp.zeros((u.shape[0],), pdt)
    for c0 in range(0, m, C):
        if Ua.shape[0] == 1:
            Uc = Ua[0, :, c0:c0 + C]
            w = jnp.einsum("nm,dn->dm", Uc, u, preferred_element_type=pdt)
            u = u - jnp.einsum("nm,dm->dn", Uc, w, preferred_element_type=pdt)
        else:
            Uc = Ua[:, :, c0:c0 + C]
            w = jnp.einsum("snm,sn->sm", Uc, u, preferred_element_type=pdt)
            u = u - jnp.einsum("snm,sm->sn", Uc, w, preferred_element_type=pdt)
        wmax = jnp.maximum(wmax, jnp.max(jnp.abs(w), axis=1))
    leak = jnp.max(wmax / (un + 1e-300))
    return u, leak


@functools.partial(
    jax.jit, donate_argnums=(1,), static_argnames=("project_every",)
)
def _advance_light(op, state: _LightState, b_perp, U, k0, k1,
                   project_every: int = 1):
    """project_every > 1 runs the (dominant, O(n·m)) U-projection GEMM only
    on steps k ≡ 0 (mod project_every). Mathematically the recurrence on
    P A P with start P b stays in the U-complement; the per-step projection
    is pure drift control. Between projections the leaked component of a
    deflated eigenvector λ_j < λ_{m+1} is amplified per step by at most
    ~(1 + 2√(λ_{m+1}/λ_max)) (the out-of-interval growth rate of the Lanczos
    polynomial), so for the flagship spectrum a stride of 16–64 keeps the
    leak at the eps·10¹-level while cutting the step cost by ~stride. The
    measured pre-projection leak (max|Uᵀu|/‖u‖) is carried in the state —
    evidence, not assumption."""
    from .ops.banded import spmv

    pdt = state.vp.dtype

    def body(k, st: _LightState) -> _LightState:
        u = spmv(op, st.vp) - st.beta[:, None] * st.vpp
        alpha = bdot(u, st.vp, pdt)
        u = u - alpha[:, None] * st.vp
        if project_every > 1:
            u, leak = lax.cond(
                k % project_every == 0,
                lambda u: _project_with_leak(u, U, pdt),
                lambda u: (u, jnp.zeros((), pdt)),
                u,
            )
        else:
            u, leak = _project_with_leak(u, U, pdt)
        leak = jnp.maximum(st.leak, leak)
        beta_sq = bdot(u, u, pdt)
        ub = bdot(u, b_perp, pdt)
        beta_new = jnp.sqrt(jnp.maximum(beta_sq, 0.0))
        lucky = beta_new < 256.0 * jnp.finfo(pdt).eps * (jnp.abs(alpha) + st.beta + 1e-300)
        beta_new = jnp.where(lucky, 0.0, beta_new)
        safe = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = jnp.where(lucky[:, None], 0.0, u / safe[:, None])
        zero = jnp.zeros((), k.dtype) if hasattr(k, "dtype") else 0
        dg = lax.dynamic_update_slice(st.dg, alpha[:, None], (zero, k - 1))
        od = lax.dynamic_update_slice(st.od, beta_new[:, None], (zero, k))
        btil = lax.dynamic_update_slice(st.btil, (ub / safe)[:, None], (zero, k))
        return _LightState(dg, od, btil, v_new, st.vp, beta_new, leak)

    return lax.fori_loop(k0, k1, body, state)


@functools.partial(
    jax.jit, donate_argnums=(1,), static_argnames=("project_every", "S")
)
def _advance_light_store(op, state: _LightState, b_perp, U, k0,
                         project_every: int = 1, S: int = 32):
    """_advance_light for steps k0..k0+S-1 that ALSO returns the S new basis
    columns as one (S·d, n) block — the building block of
    storage='segmented'. On this machine's emulated-f64 TPU a jit call
    X64-splits every f64 argument into two f32 copies at entry (measured:
    +100% of the argument bytes), so a monolithic (K·d, n) basis can never
    cross a jit boundary at flagship size; per-segment blocks keep every
    call's split peak at ~2·(U + segment) while the basis accumulates
    off-boundary as a host-held list of device arrays."""
    from .ops.banded import spmv

    pdt = state.vp.dtype
    d, n = state.vp.shape

    def body(i, carry):
        st, Vseg = carry
        k = k0 + i
        u = spmv(op, st.vp) - st.beta[:, None] * st.vpp
        alpha = bdot(u, st.vp, pdt)
        u = u - alpha[:, None] * st.vp
        if project_every > 1:
            u, leak = lax.cond(
                k % project_every == 0,
                lambda u: _project_with_leak(u, U, pdt),
                lambda u: (u, jnp.zeros((), pdt)),
                u,
            )
        else:
            u, leak = _project_with_leak(u, U, pdt)
        leak = jnp.maximum(st.leak, leak)
        beta_sq = bdot(u, u, pdt)
        ub = bdot(u, b_perp, pdt)
        beta_new = jnp.sqrt(jnp.maximum(beta_sq, 0.0))
        lucky = beta_new < 256.0 * jnp.finfo(pdt).eps * (jnp.abs(alpha) + st.beta + 1e-300)
        beta_new = jnp.where(lucky, 0.0, beta_new)
        safe = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = jnp.where(lucky[:, None], 0.0, u / safe[:, None])
        zero = jnp.zeros((), k.dtype) if hasattr(k, "dtype") else 0
        dg = lax.dynamic_update_slice(st.dg, alpha[:, None], (zero, k - 1))
        od = lax.dynamic_update_slice(st.od, beta_new[:, None], (zero, k))
        btil = lax.dynamic_update_slice(st.btil, (ub / safe)[:, None], (zero, k))
        Vseg = lax.dynamic_update_slice(Vseg, v_new, (i * d, zero))
        return (_LightState(dg, od, btil, v_new, st.vp, beta_new, leak), Vseg)

    Vseg0 = jnp.zeros((S * d, n), pdt)
    (state, Vseg) = lax.fori_loop(
        jnp.asarray(0, jnp.int32), jnp.asarray(S, jnp.int32), body,
        (state, Vseg0),
    )
    return state, Vseg


@functools.partial(jax.jit, static_argnames=("exclude_last",))
def _sweep_block(Vseg, W, exclude_last: int = 0):
    """One CGS block of the boundary reorthogonalization: coefficients of
    the working vectors W (r, d, n) against a stored segment Vseg (S·d, n),
    and the corrected W. Bounded f64 args → bounded X64-split peak.
    exclude_last masks the trailing columns of the segment out of the sweep
    (the working vectors ARE the last two stored columns — sweeping them
    against themselves would annihilate the recurrence)."""
    pdt = W.dtype
    r, d, n = W.shape
    Vk = Vseg.reshape(-1, d, n)
    S = Vk.shape[0]
    w = jnp.einsum("kdn,rdn->rkd", Vk, W, preferred_element_type=pdt)
    if exclude_last:
        mask = (jnp.arange(S) < S - exclude_last).astype(pdt)
        w = w * mask[None, :, None]
    W = W - jnp.einsum("kdn,rkd->rdn", Vk, w, preferred_element_type=pdt)
    return W, jnp.max(jnp.abs(w))


@jax.jit
def _project_and_renorm(W, U):
    """Boundary reorth epilogue: re-project both working vectors into the
    U-complement and renormalize (correction sizes ≤ drift; the induced β
    perturbation is second-order — Parlett–Scott practice)."""
    pdt = W.dtype
    W = jnp.stack(
        [deflation_project(W[0], U, pdt), deflation_project(W[1], U, pdt)]
    )
    r_, d_, n_ = W.shape
    nrm = jnp.sqrt(bdot(W.reshape(r_ * d_, n_), W.reshape(r_ * d_, n_),
                        pdt).reshape(r_, d_))
    return W / jnp.where(nrm > 0, nrm, 1.0)[:, :, None]


def _boundary_reorth(segs, state: _LightState, U):
    """Full reorthogonalization of (v_k, v_{k-1}) against every stored
    column, segment by segment (each call's f64 X64-split peak stays at
    ~2·segment). Returns the corrected state and the measured maximum
    pre-correction overlap — the drift evidence at this boundary. At the
    measured ~85 TFLOPS effective f64 einsum rate the full sweep at
    k = 1024 costs ~1 ms: per-segment-boundary FULL reorth is effectively
    free, which is why the segmented mode needs no on-demand trigger."""
    W = jnp.stack([state.vp, state.vpp])
    drift = 0.0
    for i, seg in enumerate(segs):
        W, wmax = _sweep_block(
            seg, W, exclude_last=2 if i == len(segs) - 1 else 0
        )
        drift = max(drift, float(wmax))
    W = _project_and_renorm(W, U)
    return state._replace(vp=W[0], vpp=W[1]), drift


class Pass2Audit(NamedTuple):
    """Replay-time orthonormality evidence (VERDICT r2 weak #1/#5):

    gram_max — max |⟨v_k, p⟩| over every replayed basis vector against a
      bank of `n_probes` vectors sampled uniformly across the replay (a
      sampled pairwise Gram, strictly stronger than the v₀-drift probe:
      it sees loss against RECENT vectors, where Lanczos drift starts).
    beta_rel_dev — max_s,k |‖u_k‖ − od_k| / od_k: the replayed normalizer
      against the recorded one. Bounds the pass-1/pass-2 rounding
      divergence that the 'identical op sequence ⇒ identical rounding'
      assumption hides; a value ≫ eps·k means the certificate's replay
      premise failed at this shape."""

    gram_max: jax.Array
    beta_rel_dev: jax.Array


@functools.partial(
    jax.jit, donate_argnums=(6,),
    static_argnames=("n_probes", "project_every", "stride"),
)
def _pass2_segment(op, b_perp, U, od, Yv, k0_k1, carry, n_probes: int = 0,
                   project_every: int = 1, stride: int = 1):
    """One jitted chunk of the pass-2 replay: steps k0..k1-1 over the carried
    (X, vp, vpp, beta, audit) state. Chunking matters operationally on this
    machine: a single monolithic fori_loop over the full flagship replay is
    a multi-minute device call, and the tunneled TPU worker reliably dies on
    those (r3 attempts 1–4 all crashed in/after pass-2) — the host-synced
    segments mirror pass 1's checkpoint structure. Arithmetic per step is
    identical to the monolithic version (same body, same k values)."""
    from .ops.banded import spmv

    pdt = b_perp.dtype
    d, n = b_perp.shape
    t = Yv.shape[2]
    np_ = max(int(n_probes), 0)
    k0, k1 = k0_k1

    def body(k, carry):
        X, vp, vpp, beta, (probes, filled, gmax, bdev) = carry
        u = spmv(op, vp) - beta[:, None] * vpp
        alpha = bdot(u, vp, pdt)
        u = u - alpha[:, None] * vp
        # replay the EXACT pass-1 projection schedule (same k ⇒ same branch
        # ⇒ identical op sequence ⇒ identical rounding)
        if project_every > 1:
            u = lax.cond(
                k % project_every == 0,
                lambda u: deflation_project(u, U, pdt),
                lambda u: u,
                u,
            )
        else:
            u = deflation_project(u, U, pdt)
        zero = jnp.zeros((), k.dtype) if hasattr(k, "dtype") else 0
        beta_new = lax.dynamic_slice(od, (zero, k), (d, 1))[:, 0]
        safe = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = jnp.where(beta_new[:, None] > 0, u / safe[:, None], 0.0)
        yk = lax.dynamic_slice(Yv, (zero, k, zero), (d, 1, t))[:, 0, :]
        X = X + v_new[:, :, None] * yk[:, None, :]
        if np_:
            beta_replay = jnp.sqrt(jnp.maximum(
                bdot(u, u, pdt), 0.0
            ))
            dev = jnp.where(
                beta_new > 0, jnp.abs(beta_replay - beta_new) / safe, 0.0
            )
            bdev = jnp.maximum(bdev, jnp.max(dev))
            g = jnp.einsum("pdn,dn->pd", probes, v_new,
                           preferred_element_type=pdt)
            live = (jnp.arange(probes.shape[0]) < filled)[:, None]
            gmax = jnp.maximum(gmax, jnp.max(jnp.abs(g) * live))
            # fill the next slot every `stride` steps (AFTER the dot, so a
            # vector is never audited against itself)
            take = (k % stride == 0) & (filled < np_)
            slot = jnp.minimum(filled, np_ - 1)
            upd = lax.dynamic_update_slice(
                probes, v_new[None], (slot, zero, zero))
            probes = jnp.where(take, upd, probes)
            filled = filled + take.astype(jnp.int32)
        return (X, v_new, vp, beta_new, (probes, filled, gmax, bdev))

    return lax.fori_loop(k0, k1, body, carry)


def _pass2_accumulate(op, b_perp, U, od, Yv, k_done, n_probes: int = 0,
                      project_every: int = 1, segment: int = 256):
    """Second pass (host-chunked): rerun the recurrence (deterministic — the
    same jitted ops in the same order as pass 1) and accumulate the
    solution's V-part on the fly: X[s,:,j] = Σ_k v_k[s]·Yv[s,k,j]. α is
    recomputed by the same dot pass 1 used; β (the normalizer) is replayed
    from the recorded od — the one value where divergence would compound.

    n_probes > 0 additionally runs the orthonormality/replay audit
    (`Pass2Audit`): probe slots are filled every ceil(K/n_probes) steps and
    every subsequent v_k is dotted against all filled probes.

    Design lineage: twopass.py's basis-free storage (beyond the reference),
    specialized to the deflated recurrence."""
    pdt = b_perp.dtype
    d, n = b_perp.shape
    K = od.shape[1]
    b_norms = jnp.linalg.norm(b_perp, axis=1)
    v0 = b_perp / jnp.where(b_norms > 0, b_norms, 1.0)[:, None]
    t = Yv.shape[2]
    X0 = jnp.zeros((d, n, t), pdt)
    Yv0 = Yv[:, 0, :]                                       # (d, t)
    X0 = X0 + v0[:, :, None] * Yv0[:, None, :]

    np_ = max(int(n_probes), 0)
    stride = max(1, -(-K // np_)) if np_ else 1             # ceil(K / n_probes)
    probes0 = jnp.zeros((max(np_, 1), d, n), pdt)
    carry = (X0, v0, jnp.zeros_like(v0), jnp.zeros((d,), pdt),
             (probes0, jnp.zeros((), jnp.int32),
              jnp.zeros((), pdt), jnp.zeros((), pdt)))

    k_done_i = int(k_done)
    k0 = 1
    while k0 <= k_done_i:
        k1 = min(k0 + segment, k_done_i + 1)
        carry = _pass2_segment(
            op, b_perp, U, od, Yv,
            (jnp.asarray(k0, jnp.int32), jnp.asarray(k1, jnp.int32)),
            carry, n_probes=np_, project_every=project_every, stride=stride,
        )
        jax.block_until_ready(carry[3])                      # host sync point
        k0 = k1
    X, _, _, _, (probes, filled, gmax, bdev) = carry
    return X, Pass2Audit(gmax, bdev)


def _pass2_host(bands, offsets, b_perp, U, od, Yv, k_done: int,
                project_every: int = 1, n_probes: int = 16,
                verbose: bool = False):
    """Numpy twin of the pass-2 replay (device not touched at all).

    The crash-proof endgame for this machine's flaky tunneled TPU worker:
    pass 1 records the tridiagonal in ~minutes of well-behaved segmented
    device work, and everything after — replay, solution accumulation,
    audit, certificate — can run on host f64 (LAPACK-grade, arguably tighter
    than the device's emulated f64). ~0.3 s/step at flagship size
    (project_every=1; the U-GEMV dominates), /stride with strided
    projection. Audit semantics identical to _pass2_segment."""
    b_perp = np.asarray(b_perp, np.float64)
    bands = np.asarray(bands, np.float64)
    U = np.asarray(U, np.float64)
    od = np.asarray(od, np.float64)
    Yv = np.asarray(Yv, np.float64)
    d, n = b_perp.shape
    K = od.shape[1]
    t = Yv.shape[2]
    bn = np.linalg.norm(b_perp, axis=1)
    v0 = b_perp / np.where(bn > 0, bn, 1.0)[:, None]
    X = v0[:, :, None] * Yv[:, 0, :][:, None, :]
    vp, vpp = v0, np.zeros_like(v0)
    beta = np.zeros(d)
    U0 = U[0] if U.shape[0] == 1 else None
    stride = max(1, -(-K // n_probes)) if n_probes else 1
    probes = np.zeros((0, d, n))
    gmax = bdev = 0.0

    def _spmv(v):
        out = np.zeros_like(v)
        for bidx, off in enumerate(offsets):
            col = bands[:, bidx, :]
            if off == 0:
                out += col * v
            elif off > 0:
                out[:, : n - off] += col[:, : n - off] * v[:, off:]
            else:
                out[:, -off:] += col[:, -off:] * v[:, : n + off]
        return out

    for k in range(1, int(k_done) + 1):
        u = _spmv(vp) - beta[:, None] * vpp
        alpha = np.einsum("dn,dn->d", u, vp)
        u -= alpha[:, None] * vp
        if project_every == 1 or k % project_every == 0:
            if U0 is not None:
                w = u @ U0                                   # (d, m)
                u -= w @ U0.T
            else:
                w = np.einsum("snm,sn->sm", U, u)
                u -= np.einsum("snm,sm->sn", U, w)
        beta_rec = od[:, k]
        safe = np.where(beta_rec > 0, beta_rec, 1.0)
        v_new = np.where(beta_rec[:, None] > 0, u / safe[:, None], 0.0)
        X += v_new[:, :, None] * Yv[:, k, :][:, None, :]
        if n_probes:
            beta_replay = np.linalg.norm(u, axis=1)
            bdev = max(bdev, float(np.max(np.where(
                beta_rec > 0, np.abs(beta_replay - beta_rec) / safe, 0.0
            ))))
            if probes.shape[0]:
                g = np.einsum("pdn,dn->pd", probes, v_new)
                gmax = max(gmax, float(np.abs(g).max()))
            if k % stride == 0 and probes.shape[0] < n_probes:
                probes = np.concatenate([probes, v_new[None]], axis=0)
        vp, vpp, beta = v_new, vp, beta_rec
        if verbose and k % 256 == 0:
            print(f"  [pass2-host] k={k}/{int(k_done)}", flush=True)
    return X, Pass2Audit(np.float64(gmax), np.float64(bdev))


