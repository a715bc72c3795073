"""Per-factor spectral deflation — the κ-barrier breaker for huge modes.

Capability beyond the reference (which has nothing like it): the iteration
count of the exp-sum tensor-Krylov solve scales like k* ≈ c·√κ(A_s)
(measured c ≈ 2.8 on shifted-Laplace systems — see docs/northstar.md), so a
production-size mode (n_s ~ 1e5) is out of reach for a plain Krylov basis
even when the certified tolerance is attainable in f64. Deflating the
lowest m eigenpairs of each (tridiagonal) factor:

    A_s U_s = U_s Λ_s,  U_s ∈ ℝ^{n×m} orthonormal  (host LAPACK, O(n·m))

splits every exponential action exactly:

    exp(−γ_j A_s) b_s = U_s exp(−γ_j Λ_s) (U_sᵀ b_s)            [exact]
                      + exp(−γ_j A_s) b⊥_s,   b⊥_s = b_s − U_s U_sᵀ b_s

and the Krylov recurrence only has to approximate the second term, whose
spectral interval is [λ_{m+1}, λ_max] — an effective condition number
κ_eff = κ·λ_1/λ_{m+1}. For the shifted Laplacian, λ_{m+1} ≈ σ + π²(m+1)²
grows quadratically in m, so a modest m collapses k* by orders of magnitude
(d=10, n=131072, κ=1e6: k* ≈ 2800 plain → ≈ 230 with m=1024).

The recurrence stays in the U-complement by re-projecting the working
vector every step (ops/orth.py:deflation_project — one GEMM pass over U per
step, shared across factors when they are identical). The exponential-sum
coefficients are still selected for the FULL interval [λ_min(A), λ_max(A)]
(cross-factor eigenvalue sums mix deflated and undeflated components), with
λ_min now EXACT from the deflated pairs.

Residual evaluation is the Lemma-3.4 algebra in the joint per-factor basis
B_s = [U_s | V_s | v_{k+1}]: the operator action closes exactly there
(A_s U = U Λ;  A_s V y = V T y + β_k y_k v_{k+1}), so `residual_norm_sq`
applied to the block-diagonal joint projection equals the TRUE full
residual ‖A x − b‖ (up to basis orthonormality drift) with no separate
boundary term. The final certificate re-evaluates ‖b − A x‖ from the raw
CP vectors (basis-free) with the rank-pair contraction in extended
precision (utils/cp.py:cp_norm_accurate).

Behavioural reference for everything this builds on:
/root/reference/src/tensor_krylov_method.jl:10-34 (exp-sum solve),
/root/reference/src/utils.jl:402-443 (residual algebra). The deflation
itself has no reference counterpart.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .coeffs.tables import BHTables, load_tables, select_bh
from .ops.eigen import masked_eigh, masked_eigh_tridiag_mixed
from .ops.expsum import cp_solve_sym
from .ops.gram import residual_norm_sq
from .ops.orth import bdot, deflation_project
from .types import CPTensor, KroneckerSumOperator, SolverConfig, Status
from .utils.cp import cp_residual_cross_check

__all__ = ["DeflationBasis", "deflation_basis", "solve_deflated", "DeflatedResult"]


class DeflationBasis(NamedTuple):
    """Lowest-m eigenpairs of every factor. U: (1, n, m) when all factors are
    identical (shared — one projection GEMM per step regardless of d) or
    (d, n, m); lam: (d, m) ascending."""

    U: jax.Array
    lam: jax.Array

    @property
    def m(self) -> int:
        return self.U.shape[2]


def _tridiag_parts(bands: np.ndarray, offsets: Tuple[int, ...]):
    """(diag (d, n), offdiag e (d, n-1)) with e[i] coupling rows i, i+1.

    A symmetric tridiagonal operator may be stored with either the -1 band,
    the +1 band, or both; read whichever is present and cross-check that a
    doubly-stored coupling is actually symmetric (ADVICE r2: an operator
    with only the +1 band used to silently yield e ≡ 0)."""
    d, nb, n = bands.shape
    diag = np.zeros((d, n))
    e_lo = e_hi = None
    for bidx, off in enumerate(offsets):
        if off == 0:
            diag += bands[:, bidx, :]
        elif off == -1:
            e_lo = bands[:, bidx, 1:].copy()  # bands[s,b,i] = A[i, i-1], i ≥ 1
        elif off == 1:
            e_hi = bands[:, bidx, :-1].copy()  # bands[s,b,i] = A[i, i+1], i < n-1
    if e_lo is not None and e_hi is not None:
        if not np.allclose(e_lo, e_hi, rtol=0.0, atol=0.0):
            raise ValueError(
                "offsets (-1, +1) bands disagree: operator marked symmetric "
                "but A[i, i-1] != A[i-1, i]"
            )
        return diag, e_lo
    if e_lo is not None:
        return diag, e_lo
    if e_hi is not None:
        return diag, e_hi
    return diag, np.zeros((d, n - 1))


def _toeplitz_lowest_m(n: int, m: int, a: float, b: float):
    """Analytic lowest-m eigenpairs of the symmetric tridiagonal *Toeplitz*
    matrix tridiag(b, a, b): λ_j = a + 2b·cos(jπ/(n+1)), v_j(i) =
    √(2/(n+1))·sin(ijπ/(n+1)) — the reference's analytic Laplace spectrum
    (/root/reference/src/eigenvalues.jl:226-265) generalized to any constant
    diagonal shift. O(n·m) sin evaluations (~seconds at the flagship
    n=131072, m=1024) where LAPACK stebz/stein takes minutes. The integer
    phase i·j is reduced mod 2(n+1) exactly before the float multiply, so
    every sin argument stays in [0, 2π) with ~ulp error."""
    j_all = np.arange(1, n + 1, dtype=np.int64)
    # b ≤ 0 → λ increases with j (lowest at j=1); b > 0 → reversed
    js = j_all[:m] if b <= 0 else j_all[::-1][:m]
    lam = a + 2.0 * b * np.cos(js * (np.pi / (n + 1)))
    i = np.arange(1, n + 1, dtype=np.int64)
    phase = (i[:, None] * js[None, :]) % (2 * (n + 1))
    U = np.sqrt(2.0 / (n + 1)) * np.sin(phase * (np.pi / (n + 1)))
    return lam.astype(np.float64), U


def deflation_basis(
    op: KroneckerSumOperator, m: int, dtype=None
) -> DeflationBasis:
    """Host-side setup (one-time, off the hot path — the analogue of the
    reference's coefficient-file loading): lowest-m eigenpairs per factor.

    Constant-coefficient tridiagonal factors (Laplace / reaction–diffusion,
    the flagship family) take the analytic Toeplitz path (`_toeplitz_lowest_m`,
    sin eigenvectors — seconds at n=1e5); other tridiagonal symmetric factors
    use LAPACK stebz/stein via scipy.linalg.eigh_tridiagonal (O(n·m));
    anything else falls back to a dense eigh of the materialized factor
    (small-n path). Identical factors are detected and computed once
    (U shape (1, n, m)).
    """
    if not op.symmetric:
        raise ValueError("deflation requires a symmetric (SPD) operator")
    bands = np.asarray(op.bands, np.float64)
    d, nb, n = bands.shape
    if not 0 < m < n:
        raise ValueError(f"need 0 < m < n, got m={m}, n={n}")
    dtype = dtype or op.dtype

    shared = all(np.array_equal(bands[0], bands[s]) for s in range(1, d))
    tridiag = set(op.offsets) <= {-1, 0, 1}

    def lowest_m(s: int):
        if tridiag:
            diag, e = _tridiag_parts(bands[s : s + 1], op.offsets)
            a, off = diag[0], e[0]
            if (
                off.size
                and np.all(a == a[0])
                and np.all(off == off[0])
                and off[0] != 0.0
            ):
                return _toeplitz_lowest_m(n, m, float(a[0]), float(off[0]))
            from scipy.linalg import eigh_tridiagonal

            w, U = eigh_tridiagonal(
                diag[0], e[0], select="i", select_range=(0, m - 1)
            )
        else:
            from .models.gallery import bands_to_dense

            A = bands_to_dense(
                KroneckerSumOperator(jnp.asarray(bands[s : s + 1]), op.offsets, True)
            )[0]
            w, U = np.linalg.eigh(A)
            w, U = w[:m], U[:, :m]
        return w, U

    if shared:
        w0, U0 = lowest_m(0)
        lam = np.broadcast_to(w0, (d, m))
        U = U0[None]
    else:
        pairs = [lowest_m(s) for s in range(d)]
        lam = np.stack([p[0] for p in pairs])
        U = np.stack([p[1] for p in pairs])
    # host-resident (numpy) on purpose: solve_deflated controls WHEN U goes
    # to the device (after the big basis allocation — HBM fragmentation)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    return DeflationBasis(np.asarray(U, np_dtype), np.asarray(lam, np.float64))


@dataclasses.dataclass(frozen=True)
class DeflatedResult:
    """Solution + the three-tier residual evidence:

      * relative_residual — Lemma-3.4 estimate per checkpoint (floors at
        ~√eps·(CP term mass)/‖b‖, DESIGN.md §6; informative above ~1e-8).
      * certified_bound — RIGOROUS per-checkpoint bound (modulo f64 basis
        orthonormality): sup|1−x·g(x)| over the certified spectral interval
        (analytic exp-sum error, extended precision) + √(Σ_s β²‖y_𝔏‖²)/‖b‖
        (measured Krylov boundary, a cancellation-free sum of positives).
        Convergence is declared on THIS bound.
      * measured_cp_residual — basis-free ‖b − A x‖/‖b‖ from the raw CP
        vectors (utils/cp.py:cp_residual_cross_check); independent of every
        solver assumption — a cross-check, not a bound. Only meaningful
        above its own floor `cp_residual_floor` (√(eps64·Gram-mass)/‖b‖):
        a reading ≤ floor is the statement "residual ≤ floor", nothing
        finer.
    """

    x: CPTensor
    status: int
    niterations: int                  # Krylov steps taken (excl. deflated part)
    m: int                            # deflation rank
    relative_residual: List[float]    # Lemma-3.4 estimate per checkpoint
    certified_bound: List[float]      # rigorous bound per checkpoint
    checkpoints: List[int]
    measured_cp_residual: Optional[float]
    expsum_sup: float                 # sup|1−x g(x)| component of the bound
    expsum_rank: int
    lambda_min: float                 # exact (deflated) λ_min of A
    lambda_max: float                 # Gershgorin upper bound on λ_max of A
    # measured orthonormality drift of the basis: max_k |⟨v_k, v₀⟩| (the
    # free b̃ probe) — quantifies the certificate's basis slack
    orthogonality_drift: float = 0.0
    # validity floor of measured_cp_residual (same ‖b‖ normalization)
    cp_residual_floor: Optional[float] = None
    # storage='twopass' replay audit (Pass2Audit): sampled pairwise
    # |⟨v_k, probe⟩| max, and the replayed-vs-recorded β deviation
    pass2_gram_max: Optional[float] = None
    pass2_beta_rel_dev: Optional[float] = None
    # max measured pre-projection U-leak max|Uᵀu|/‖u‖ (evidence for
    # project_every > 1; always measured on the twopass path)
    projection_leak: Optional[float] = None
    # storage='segmented': max measured pre-correction overlap |⟨v, V⟩| at
    # the segment-boundary full reorthogonalizations — the drift that WAS
    # there and was removed
    boundary_drift_max: Optional[float] = None
    # storage='df64' v2 (noise-recording) certificate decomposition at the
    # final checkpoint: bound = expsum_sup + boundary + dev + eta + r2
    # (see _evaluate_host_recorded). All measured except eta, whose
    # eps_elem constant is itself measured in-process (eft_selfcheck).
    relation_dev_term: Optional[float] = None     # recorded commit devs
    relation_eta_term: Optional[float] = None     # expansion elementwise
    relation_r2_term: Optional[float] = None      # 2nd-order Frechet tail
    perturbation_rho: Optional[float] = None      # max_s ||[C_s; W_s]||_F
    # FULL-basis orthonormality bound max|VᵀV − I| (r4: supersedes the
    # sampled Pass2Audit probes for the df64 path — VERDICT r3 #5)
    gram_deviation: Optional[float] = None
    eft_eps_measured: Optional[float] = None      # composed-EFT selfcheck

    @property
    def converged(self):
        return self.status == Status.CONVERGED


def _gershgorin_per_factor(op: KroneckerSumOperator) -> np.ndarray:
    """Per-factor Gershgorin upper bounds on λ_max(A_s) from the band rows."""
    bands = np.asarray(op.bands, np.float64)
    d, nb, n = bands.shape
    per_factor = np.zeros(d)
    for s in range(d):
        rows = np.zeros(n)
        for bidx, off in enumerate(op.offsets):
            col = bands[s, bidx]
            if off == 0:
                rows += col
            else:
                rows += np.abs(col)
        per_factor[s] = rows.max()
    return per_factor


def _gershgorin_max(op: KroneckerSumOperator) -> float:
    """Exact upper bound on λ_max(A) = Σ_s λ_max(A_s) from the band rows."""
    return float(_gershgorin_per_factor(op).sum())


_EFT_EPS_CACHE: dict = {}


def _eft_eps() -> float:
    """Measured composed-EFT elementwise epsilon of the CURRENT backend
    (ops/expansion.eft_selfcheck), x4 safety, floored at the algorithmic
    2^-71. Cached per backend per process; recorded on results."""
    be = jax.default_backend()
    if be not in _EFT_EPS_CACHE:
        from .ops.expansion import eft_selfcheck

        chk = eft_selfcheck()
        _EFT_EPS_CACHE[be] = max(float(chk["composed_acc_rel"]), 2.0 ** -71) * 4.0
    return _EFT_EPS_CACHE[be]


class _DeflState(NamedTuple):
    """Deflated-Lanczos state in the (d, K, n) layout.

    The generic KrylovState stores V as (K, d, n) — optimal for the f32
    small-step writes, but on TPU the d-sized sublane dimension pads to a
    multiple of 8 (d=10 → 16: a 1.6× memory expansion that OOMs the f64
    flagship, plus f64-emulation temp copies). Here V is (d, K, n)
    (K pads by ≤ 7 rows) and is WRITE-ONLY in the hot loop: the three-term
    recurrence carries v_{k-1}, v_{k-2} explicitly, and T is stored as
    diag/offdiag vectors instead of a dense (d, K, K) matrix.

    r3 layout fix: V is stored 2-D as (K·d, n) in k-major row order (step k
    owns the contiguous row block [k·d, (k+1)·d)). The 3-D (d, K, n) layout
    let XLA pick d as the sublane dimension (minor-to-major {2,0,1}), which
    pads 10 → 16 — a 1.6× expansion that, with the f64 X64Combine temp,
    OOM'd the m=2048 flagship at 16.5 GB. A 2-D buffer's sublane dim is
    K·d, which pads by < 8 rows. Reshape to (K, d, n) is free for reads
    (same memory order)."""

    V: jax.Array     # (K*d, n), row k*d+s = basis column k of factor s
    dg: jax.Array    # (d, K) T diagonal: dg[:, j] = α for column j
    od: jax.Array    # (d, K) T offdiag: od[:, j] couples columns j-1, j
    btil: jax.Array  # (d, K) ⟨v_j, b⊥⟩ (≈ β₀ e₀; the rest is drift telemetry)
    vp: jax.Array    # (d, n) v_{k-1}
    vpp: jax.Array   # (d, n) v_{k-2}
    beta: jax.Array  # (d,) last offdiagonal


@functools.partial(jax.jit, static_argnames=("K", "pdt"))
def _init_defl_state(b_perp, K: int, pdt) -> Tuple[_DeflState, jax.Array]:
    """jitted so the zeros→first-column write fuses into ONE (d, K, n)
    allocation — the eager zeros + dynamic_update_slice pair materialized
    the flagship basis TWICE (2 × 7.4 GB) and OOM'd the chip."""
    d, n = b_perp.shape
    b_norms = jnp.linalg.norm(b_perp.astype(pdt), axis=1)
    # b⊥_s = 0 (b_s entirely inside span(U_s)) is legal: freeze that factor's
    # recurrence at zero instead of poisoning the state with NaN
    v0 = (b_perp.astype(pdt) / jnp.where(b_norms > 0, b_norms, 1.0)[:, None]).astype(pdt)
    V = jnp.zeros((K * d, n), pdt)
    V = lax.dynamic_update_slice(V, v0, (0, 0))
    # distinct buffers (dg/od/btil feed a donated argument — aliased zeros
    # would be donated twice)
    dg = jnp.zeros((d, K), pdt)
    od = jnp.zeros((d, K), pdt)
    btil = jnp.zeros((d, K), pdt).at[:, 0].set(b_norms)
    return (
        _DeflState(V, dg, od, btil, v0, jnp.zeros_like(v0), jnp.zeros((d,), pdt)),
        b_norms,
    )


@functools.partial(
    jax.jit,
    static_argnames=("reorth", "reorth_tol", "project_every"),
    donate_argnums=(1,),
)
def _advance(op, state: _DeflState, b_perp, U, k0, k1, *, reorth,
             reorth_tol: float = 0.0, project_every: int = 1):
    """Run Lanczos steps k0..k1-1 (step k writes basis column k) with
    per-step (or strided — see _advance_light) deflation projection; f64
    throughout (proj dtype = V dtype)."""
    from .ops.banded import spmv

    pdt = state.V.dtype
    d, n = state.vp.shape
    K = state.dg.shape[1]
    thresh = reorth_tol if reorth_tol > 0.0 else float(np.sqrt(np.finfo(np.float64).eps))

    def body(k, st: _DeflState) -> _DeflState:
        u = spmv(op, st.vp) - st.beta[:, None] * st.vpp
        alpha = bdot(u, st.vp, pdt)
        u = u - alpha[:, None] * st.vp
        if project_every > 1:
            u = lax.cond(
                k % project_every == 0,
                lambda u: deflation_project(u, U, pdt),
                lambda u: u,
                u,
            )
        else:
            u = deflation_project(u, U, pdt)

        def sweep(u):
            # block-sequential CGS over static column chunks: each chunk's
            # einsum operand stays under the f64-emulation splat budget
            # (ops/orth.py:_PROJ_CHUNK_ELEMS); small K ⇒ one chunk, the
            # original single-sweep path
            from .ops.orth import _proj_col_chunk

            C = _proj_col_chunk(d * n, K)
            for c0 in range(0, K, C):
                Cc = min(C, K - c0)
                Vc = st.V[c0 * d:(c0 + Cc) * d].reshape(Cc, d, n)
                mask = ((c0 + jnp.arange(Cc))[:, None] < k).astype(pdt)
                w = jnp.einsum("kdn,dn->kd", Vc, u,
                               preferred_element_type=pdt) * mask
                u = u - jnp.einsum("kdn,kd->dn", Vc, w,
                                   preferred_element_type=pdt)
            return u

        if reorth == "always":
            u = sweep(u)
        beta_sq = bdot(u, u, pdt)
        ub = bdot(u, b_perp.astype(pdt), pdt)
        if reorth == "auto":
            # v₀-drift probe |⟨v_k, v₀⟩| = |⟨u, b⊥⟩|/(β‖b⊥_s‖)
            bn = st.btil[:, 0]
            probe = jnp.max(
                jnp.abs(ub) / (bn * jnp.sqrt(jnp.maximum(beta_sq, 1e-300)) + 1e-300)
            )

            def do_sweep(u):
                u2 = sweep(u)
                return (
                    u2,
                    bdot(u2, u2, pdt),
                    bdot(u2, b_perp.astype(pdt), pdt),
                )

            u, beta_sq, ub = lax.cond(
                probe > thresh, do_sweep, lambda u: (u, beta_sq, ub), u
            )

        beta_new = jnp.sqrt(jnp.maximum(beta_sq, 0.0))
        # exhaustion/breakdown: an (near-)invariant deflated subspace makes
        # β ≈ 0 — freeze with an inert zero column (A·0 = 0, ⟨·,0⟩ = 0)
        lucky = beta_new < 256.0 * jnp.finfo(pdt).eps * (jnp.abs(alpha) + st.beta + 1e-300)
        beta_new = jnp.where(lucky, 0.0, beta_new)
        safe = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = jnp.where(lucky[:, None], 0.0, u / safe[:, None])

        zero = jnp.zeros((), k.dtype) if hasattr(k, "dtype") else 0
        V = lax.dynamic_update_slice(st.V, v_new, (k * d, zero))
        dg = lax.dynamic_update_slice(st.dg, alpha[:, None], (zero, k - 1))
        od = lax.dynamic_update_slice(st.od, beta_new[:, None], (zero, k))
        btil = lax.dynamic_update_slice(st.btil, (ub / safe)[:, None], (zero, k))
        return _DeflState(V, dg, od, btil, v_new, st.vp, beta_new)

    return lax.fori_loop(k0, k1, body, state)


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


# columns per chunk of the df64 sweeps: even f32-operand einsums with
# preferred_element_type=f64 splat the big operand into 8 f32 components on
# this backend (measured: a full-K sweep wanted 56 GB); chunked fori bodies
# bound the splat to ~8·C·d·n·4 bytes
_DF64_SWEEP_COLS = 16


def _split32(x):
    """f64 → (hi, lo) f32 pair: hi = fl32(x), lo = fl32(x − hi). Represents
    x to ~48 bits (rel. 7e-15) in a form that is FREE to cross jit
    boundaries on this backend (f32 arrays are not X64-split)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


class _Df64State(NamedTuple):
    """storage='df64' v2 state — the noise-RECORDING expansion Lanczos.

    Design (r4, closing VERDICT r3 #1/#4): the r3 flagship's 9.8e-6 true-
    residual gap was the emulated-f64 recurrence noise that the per-step
    full reorthogonalization REMOVED from the vectors but the projected
    tridiagonal never saw. v2 makes the bookkeeping exact instead of
    fighting the noise:

      * the recurrence runs in f32-EXPANSION arithmetic (ops/expansion.py:
        triples inside the step, measured elementwise error ~2.6e-16 on
        this TPU vs 1.4e-14 emulated-f64), with the basis CARRIED as the
        stored 48-bit pair — so "stored column" and "recurrence operand"
        are the same exact value and storage rounding never enters the
        relation;
      * every sweep coefficient (W), deflation-projection coefficient (C)
        and commit deviation (dev_k = ‖z − β_k v_k^stored‖) is RECORDED.
        The exact relation per step is then
          A v_{k-1} = V w + U c + α v_{k-1} + β_{k-1} v_{k-2}
                      + β_k v_k + dev_vec − η,
        with η only the expansion arithmetic's elementwise rounding. The
        projected solve inverts the PERTURBED per-factor matrices
        (T + W is still a Kronecker-sum factor!) so W and C leave the
        error budget entirely; dev and η enter the certificate as a
        measured/modeled term (see _evaluate_host_recorded).

    All big buffers are f32 (no X64-split jit-boundary tax); the f64
    arrays are k-sized."""

    dg: jax.Array      # (d, K) f64
    od: jax.Array      # (d, K) f64
    btil: jax.Array    # (d, K) f64 — drift telemetry (RHS uses β₀ e₀)
    vp_h: jax.Array    # (d, n) f32  v_{k-1} (stored-pair carry)
    vp_l: jax.Array    # (d, n) f32
    vq_h: jax.Array    # (d, n) f32  v_{k-2}
    vq_l: jax.Array    # (d, n) f32
    beta: jax.Array    # (d,) f64
    leak: jax.Array    # () f64 max pre-projection |Uᵀz|/‖z‖
    sweep_overlap: jax.Array  # () f64 max pre-sweep |⟨z, v_j⟩|/‖z‖
    Vh: jax.Array      # (Kp*d, n) f32 basis pair, k-major rows
    Vl: jax.Array      # (Kp*d, n) f32
    W: jax.Array       # (d, Kp, Kp) f32 — W[s, j, k-1] = sweep coeff of
    #                    column j recorded at step k (relation column k-1)
    C: jax.Array       # (d, m, Kp) f32 — projection coeffs at step k
    dev: jax.Array     # (d, K) f64 — ‖z − β_k v_k^stored‖₂ per step


@functools.partial(
    jax.jit, donate_argnums=(3,),
    static_argnames=("offsets", "S", "project_every", "sweep_every"),
)
def _df64_advance(bands_h, bands_l, offsets, state: _Df64State, b_perp,
                  Uh, Ul, k0, S: int = 32, project_every: int = 1,
                  sweep_every: int = 1):
    """Run S full-reorth recording steps k0..k0+S-1 in ONE device call.

    Replaces the r3 three-calls-per-step structure (pre/sweep/commit) whose
    per-call tunnel dispatch dominated the flagship wall-clock (VERDICT r3
    #4: 44 min for 768 steps ≈ 3.4 s/step against ~ms of compute). The
    sweep/projection chunking lives inside fori_loops, so the largest f64
    splat temp stays bounded exactly as before."""
    from .ops import expansion as ex

    d, n = state.vp_h.shape
    m_ = Uh.shape[1]
    Kp = state.W.shape[1]
    C_ = _DF64_SWEEP_COLS
    nch_max = state.Vh.shape[0] // (C_ * d)
    # projection chunk width: the serial fori over m/Cm tall-skinny GEMMs
    # dominates the flagship step (~1.6 s/step at m=2048, r4); a wider
    # chunk trades splat-temp HBM (~8·n·Cm·4 B) for fewer, better-shaped
    # GEMMs. Env-tunable so the campaign can A/B it WITHOUT changing the
    # default HLO (the persistent compile cache keys on HLO).
    Cm = min(m_, int(os.environ.get("TK_DF64_PROJ_CHUNK", "128")))
    while m_ % Cm:
        # non-dividing chunks would clamp the dynamic_slice and project
        # the tail columns twice — halve down to a divisor
        Cm //= 2
    nchm = m_ // Cm
    pdt = state.dg.dtype
    eye_d = jnp.eye(d, dtype=pdt)

    def body(i, st: _Df64State) -> _Df64State:
        k = k0 + jnp.asarray(i, jnp.int32)
        z32 = jnp.zeros((), jnp.int32)
        # ---- expansion recurrence core (elementwise; triple headroom) ----
        z = ex.triple_spmv_pairs(bands_h, bands_l, offsets, st.vp_h, st.vp_l)
        z = ex.triple_sub(
            z, ex.pair_scale_f64(st.vq_h, st.vq_l, st.beta[:, None]))
        zf = ex.triple_to_f64(z)
        vpf = st.vp_h.astype(pdt) + st.vp_l.astype(pdt)
        alpha = bdot(zf, vpf, pdt)
        z = ex.triple_sub(
            z, ex.pair_scale_f64(st.vp_h, st.vp_l, alpha[:, None]))

        # ---- deflation projection (recorded coefficients) ----
        def do_proj(z):
            zf = ex.triple_to_f64(z)
            un = jnp.sqrt(bdot(zf, zf, pdt))
            cbuf = jnp.zeros((d, m_), pdt)
            wmax = jnp.zeros((d,), pdt)

            def pbody(ci, carry):
                z, cbuf, wmax = carry
                c0 = ci * Cm
                Uhc = lax.dynamic_slice(Uh, (0, c0), (n, Cm))
                Ulc = lax.dynamic_slice(Ul, (0, c0), (n, Cm))
                zf = ex.triple_to_f64(z)
                zh, zl = _split32(zf)
                w = (jnp.einsum("nm,dn->dm", Uhc, zh, preferred_element_type=pdt)
                     + jnp.einsum("nm,dn->dm", Uhc, zl, preferred_element_type=pdt)
                     + jnp.einsum("nm,dn->dm", Ulc, zh, preferred_element_type=pdt))
                wh, wl = _split32(w)
                corr = (jnp.einsum("nm,dm->dn", Uhc, wh, preferred_element_type=pdt)
                        + jnp.einsum("nm,dm->dn", Uhc, wl, preferred_element_type=pdt)
                        + jnp.einsum("nm,dm->dn", Ulc, wh, preferred_element_type=pdt))
                z = ex.triple_sub_f64(z, corr)
                cbuf = lax.dynamic_update_slice(
                    cbuf, w, (z32, jnp.asarray(ci * Cm, jnp.int32)))
                return (z, cbuf, jnp.maximum(wmax, jnp.max(jnp.abs(w), axis=1)))

            z, cbuf, wmax = lax.fori_loop(0, nchm, pbody, (z, cbuf, wmax))
            return z, cbuf, jnp.max(wmax / (un + 1e-300))

        if project_every > 1:
            z, cvec, leak = lax.cond(
                k % project_every == 0, do_proj,
                lambda z: (z, jnp.zeros((d, m_), pdt), jnp.zeros((), pdt)), z)
        else:
            z, cvec, leak = do_proj(z)

        # ---- CGS sweep vs stored columns < k (recorded; optionally
        # strided — the recording keeps the relation exact either way, so
        # striding trades measured Gram slack for the dominant f64-GEMM
        # splat traffic at large k; see solve_deflated's sweep_every) ----
        def do_sweep(z):
            zf = ex.triple_to_f64(z)
            un = jnp.sqrt(bdot(zf, zf, pdt))
            zh0, zl0 = _split32(zf)
            nch = jnp.minimum(
                jnp.asarray((k + C_ - 1) // C_, jnp.int32), nch_max)

            def wbody(ci, w):
                ci = jnp.asarray(ci, jnp.int32)
                r0 = ci * (C_ * d)
                Vhc = lax.dynamic_slice(st.Vh, (r0, z32), (C_ * d, n))
                Vlc = lax.dynamic_slice(st.Vl, (r0, z32), (C_ * d, n))
                full = (jnp.einsum("Kn,dn->Kd", Vhc, zh0, preferred_element_type=pdt)
                        + jnp.einsum("Kn,dn->Kd", Vhc, zl0, preferred_element_type=pdt)
                        + jnp.einsum("Kn,dn->Kd", Vlc, zh0, preferred_element_type=pdt))
                wc = jnp.einsum("kid,id->ki", full.reshape(C_, d, d), eye_d)
                return lax.dynamic_update_slice(w, wc, (ci * C_, z32))

            w = lax.fori_loop(0, nch, wbody,
                              jnp.zeros((nch_max * C_, d), pdt))
            w = w * (jnp.arange(nch_max * C_)[:, None] < k).astype(pdt)
            overlap = jnp.max(jnp.max(jnp.abs(w), axis=0) / (un + 1e-300))
            wh, wl = _split32(w)

            def cbody(ci, corr):
                ci = jnp.asarray(ci, jnp.int32)
                r0 = ci * (C_ * d)
                Vhc = lax.dynamic_slice(st.Vh, (r0, z32), (C_ * d, n))
                Vlc = lax.dynamic_slice(st.Vl, (r0, z32), (C_ * d, n))
                whc = lax.dynamic_slice(wh, (ci * C_, z32), (C_, d))
                wlc = lax.dynamic_slice(wl, (ci * C_, z32), (C_, d))
                Wh_full = (whc[:, :, None] * eye_d).reshape(C_ * d, d).astype(jnp.float32)
                Wl_full = (wlc[:, :, None] * eye_d).reshape(C_ * d, d).astype(jnp.float32)
                return corr + (
                    jnp.einsum("Kn,Kd->dn", Vhc, Wh_full, preferred_element_type=pdt)
                    + jnp.einsum("Kn,Kd->dn", Vhc, Wl_full, preferred_element_type=pdt)
                    + jnp.einsum("Kn,Kd->dn", Vlc, Wh_full, preferred_element_type=pdt))

            corr = lax.fori_loop(0, nch, cbody, jnp.zeros((d, n), pdt))
            return ex.triple_sub_f64(z, corr), w, overlap

        if sweep_every > 1:
            z, w, overlap = lax.cond(
                k % sweep_every == 0, do_sweep,
                lambda z: (z, jnp.zeros((nch_max * C_, d), pdt),
                           jnp.zeros((), pdt)), z)
        else:
            z, w, overlap = do_sweep(z)

        # ---- β, breakdown guard, commit (recorded deviation) ----
        zf = ex.triple_to_f64(z)
        beta_sq = bdot(zf, zf, pdt)
        ub = bdot(zf, b_perp, pdt)
        beta_new = jnp.sqrt(jnp.maximum(beta_sq, 0.0))
        lucky = beta_new < 256.0 * jnp.finfo(pdt).eps * (
            jnp.abs(alpha) + st.beta + 1e-300)
        beta_new = jnp.where(lucky, 0.0, beta_new)
        safe = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = ex.triple_scale_f64(z, (1.0 / safe)[:, None])
        (vh2, vl2), _ = ex.triple_round_pair(v_new)
        vh2 = jnp.where(lucky[:, None], jnp.float32(0), vh2)
        vl2 = jnp.where(lucky[:, None], jnp.float32(0), vl2)
        # exact commit deviation: z − β·(stored pair), in expansion arith
        devv = ex.triple_sub(
            z, ex.pair_scale_f64(vh2, vl2, beta_new[:, None]))
        devf = ex.triple_to_f64(devv)
        dev_k = jnp.sqrt(bdot(devf, devf, pdt))

        Vh = lax.dynamic_update_slice(st.Vh, vh2, (k * d, z32))
        Vl = lax.dynamic_update_slice(st.Vl, vl2, (k * d, z32))
        dg = lax.dynamic_update_slice(st.dg, alpha[:, None], (z32, k - 1))
        od = lax.dynamic_update_slice(st.od, beta_new[:, None], (z32, k))
        btil = lax.dynamic_update_slice(st.btil, (ub / safe)[:, None], (z32, k))
        dev = lax.dynamic_update_slice(st.dev, dev_k[:, None], (z32, k))
        W = lax.dynamic_update_slice(
            st.W, w[:Kp].T[:, :, None].astype(jnp.float32), (z32, z32, k - 1))
        Cb = lax.dynamic_update_slice(
            st.C, cvec[:, :, None].astype(jnp.float32), (z32, z32, k - 1))
        return _Df64State(dg, od, btil, vh2, vl2, st.vp_h, st.vp_l, beta_new,
                          jnp.maximum(st.leak, leak),
                          jnp.maximum(st.sweep_overlap, overlap),
                          Vh, Vl, W, Cb, dev)

    return lax.fori_loop(0, S, body, state)


@functools.partial(jax.jit, static_argnames=("d", "rows"))
def _df64_gram_row_chunk(Vh, Vl, r0, k, d: int, rows: int = _DF64_SWEEP_COLS):
    """max |(VᵀV − I)[rows r0..r0+C·d)| against ALL columns — one bounded
    device call (~seconds at flagship shape). The monolithic double-fori
    version was a multi-minute single call that reliably killed this
    machine's tunneled TPU worker (measured twice at the flagship first
    checkpoint); the host-chunked outer loop keeps every call inside the
    tunnel's patience, mirroring the pass-2 segmenting rationale."""
    pdt = jnp.float64
    C_ = rows
    total_rows = Vh.shape[0]
    n = Vh.shape[1]
    nch = total_rows // (_DF64_SWEEP_COLS * d)
    z32 = jnp.zeros((), jnp.int32)
    r0 = jnp.minimum(r0, jnp.asarray(total_rows - C_ * d, jnp.int32))
    Ah = lax.dynamic_slice(Vh, (r0, z32), (C_ * d, n))
    Al = lax.dynamic_slice(Vl, (r0, z32), (C_ * d, n))

    Cb = _DF64_SWEEP_COLS
    def inner(cj, acc):
        r1 = jnp.asarray(cj * (Cb * d), jnp.int32)
        Bh = lax.dynamic_slice(Vh, (r1, z32), (Cb * d, n))
        Bl = lax.dynamic_slice(Vl, (r1, z32), (Cb * d, n))
        G = (jnp.einsum("an,bn->ab", Ah, Bh, preferred_element_type=pdt)
             + jnp.einsum("an,bn->ab", Ah, Bl, preferred_element_type=pdt)
             + jnp.einsum("an,bn->ab", Al, Bh, preferred_element_type=pdt)
             + jnp.einsum("an,bn->ab", Al, Bl, preferred_element_type=pdt))
        ia = r0 + jnp.arange(C_ * d)
        jb = r1 + jnp.arange(Cb * d)
        same_s = (ia[:, None] % d) == (jb[None, :] % d)
        active = ((ia[:, None] // d) < k) & ((jb[None, :] // d) < k) & same_s
        dev = jnp.abs(G - (ia[:, None] == jb[None, :]).astype(pdt))
        return jnp.maximum(acc, jnp.max(jnp.where(active, dev, 0.0)))

    return lax.fori_loop(0, nch, inner, jnp.zeros((), pdt))


def _df64_gram_deviation_host(Vh, Vl, k: int, d: int) -> float:
    """Full-basis max|VᵀV − I| via tunnel-safe row-chunk calls (host loop).
    Row width 2x the sweep chunk: halves the call count (each call reads
    the full active basis) while staying well inside the worker's patience."""
    C_ = min(2 * _DF64_SWEEP_COLS, Vh.shape[0] // d)
    nch = -(-Vh.shape[0] // (C_ * d))
    dev = 0.0
    kk = jnp.asarray(k, jnp.int32)
    done = 0
    try:
        for ci in range(nch):
            if ci * C_ >= k:
                break
            v = _df64_gram_row_chunk(
                Vh, Vl, jnp.asarray(ci * C_ * d, jnp.int32), kk, d, rows=C_)
            jax.block_until_ready(v)
            dev = max(dev, float(v))
            done = ci + 1
    except jax.errors.JaxRuntimeError as e:
        # a worker fault mid-measurement must not lose the SOLVE: return
        # the partial maximum (still genuine evidence over `done` chunks)
        print(f"[gram] worker fault after {done}/{nch} row chunks "
              f"({type(e).__name__}) — partial measurement kept", flush=True)
    return dev


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("rows",))
def _df64_assemble_chunk(acc, Vh, Vl, r0, Ych, Ycl, rows: int):
    """acc (d, n, t) f64 += Σ_k V_pair[k, s, :]·Yv_pair[s, k, t] over one
    row chunk of the stored basis. All big operands enter as f32 (no
    X64-split tax); the 3-product pair GEMM accumulates in f64 (~7.5e-15,
    BASELINE.md r3). Part of the final='device' assembly that replaces the
    host basis pull (~4 GB ≈ 45 min at this tunnel's 1.6 MB/s)."""
    d, n, t = acc.shape
    f64 = jnp.float64
    z32 = jnp.zeros((), jnp.int32)
    Vhc = lax.dynamic_slice(Vh, (r0, z32), (rows * d, n)).reshape(rows, d, n)
    Vlc = lax.dynamic_slice(Vl, (r0, z32), (rows * d, n)).reshape(rows, d, n)
    acc = acc + (
        jnp.einsum("kdn,dkt->dnt", Vhc, Ych, preferred_element_type=f64)
        + jnp.einsum("kdn,dkt->dnt", Vhc, Ycl, preferred_element_type=f64)
        + jnp.einsum("kdn,dkt->dnt", Vlc, Ych, preferred_element_type=f64))
    return acc


@functools.partial(jax.jit, donate_argnums=(0,))
def _df64_ulift_chunk(acc, Uhc, Ulc, Yuh, Yul):
    """acc (d, n, t) f64 += U_pair[:, chunk]·Yu_pair[d, chunk, t] (shared
    deflation basis; same 3-product pair form as _df64_assemble_chunk)."""
    f64 = jnp.float64
    acc = acc + (
        jnp.einsum("nm,dmt->dnt", Uhc, Yuh, preferred_element_type=f64)
        + jnp.einsum("nm,dmt->dnt", Uhc, Yul, preferred_element_type=f64)
        + jnp.einsum("nm,dmt->dnt", Ulc, Yuh, preferred_element_type=f64))
    return acc


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


def expsum_sup_error(omega, alpha, kappa: float, n_grid: int = 200_000) -> float:
    """sup_{x ∈ [1, κ]} |1 − x·Σ_j ω_j e^{−α_j x}| — the analytic relative-
    residual bound of the exponential-sum inverse, evaluated on host in
    extended precision (the quantity itself is stable: 1 − x·g cancels only
    at the eps level, so longdouble gives ~1e-19 absolute accuracy — far
    below any certifiable target). Log-spaced grid; the error function's
    finest oscillation scale near x = 1 is ~1/α_max ≫ the grid spacing for
    the table's α ranges."""
    om = np.asarray(omega, np.float64).astype(np.longdouble)
    al = np.asarray(alpha, np.float64).astype(np.longdouble)
    x = np.exp(np.linspace(0.0, np.log(np.longdouble(kappa)), n_grid))
    g = np.zeros_like(x)
    for w_, a_ in zip(om, al):
        if w_ != 0.0:
            g += w_ * np.exp(-a_ * x)
    return float(np.max(np.abs(1.0 - x * g)))


@functools.partial(jax.jit, static_argnames=("eigh_impl",))
def _evaluate(
    dg, od, btil, beta,  # (d, K) T diag/offdiag, compressed RHS, (d,) β_k
    k,
    lam,            # (d, m) deflated eigenvalues
    c,              # (d, m) U-coefficients of b
    b_norm,         # scalar ‖b‖ = Π_s ‖b_s‖
    lam_min,        # exact Σ_s λ_1 (scalar)
    omega, alpha, t_mask,  # (tmax,) exp-sum coefficients (fixed per solve)
    eigh_impl: str = "dense",
):
    """Projected solve + joint-basis residual at Krylov size k.

    Returns (rel_est, boundary_rel_sq, Yu (d, m, tmax), Yv (d, K, tmax),
    weights (tmax,)). boundary_rel_sq is the cancellation-free part of the
    Lemma-3.4 residual (Σ_s β_k²‖y_𝔏‖² — a sum of positives), used by the
    rigorous certificate; rel_est additionally includes the compressed part,
    which floors at ~√eps·(term mass) (DESIGN.md §6)."""
    d, K = dg.shape
    m = lam.shape[1]
    pdt = dg.dtype

    # dense padded T from the diag/offdiag vectors (k-sized work only)
    idx = jnp.arange(K)
    H = jnp.zeros((d, K, K), pdt)
    H = H.at[:, idx, idx].set(dg)
    H = H.at[:, idx[1:], idx[1:] - 1].set(od[:, 1:])
    H = H.at[:, idx[1:] - 1, idx[1:]].set(od[:, 1:])

    # V-block: exp(−γ_j T_s) b̃ via eigh of the masked tridiagonal minor.
    # T is tridiagonal by construction, so the TPU path uses the mixed-
    # precision tridiagonal solver (f64 dense eigh is software-emulated and
    # ~100 ms-scale per K×K matrix on TPU — ruinous at flagship K).
    if eigh_impl == "tridiag_mixed":
        w, Q = masked_eigh_tridiag_mixed(H, k)
    else:
        w, Q = masked_eigh(H, k)
    weights, Yv = cp_solve_sym(w, Q, btil, k, omega, alpha, t_mask, lam_min)

    # U-block: exp(−γ_j Λ_s) c_s — exact diagonal scaling
    gam = (alpha / lam_min)[None, None, :]                            # (1,1,t)
    ex_u = jnp.exp(-jnp.clip(lam[:, :, None] * gam, -700.0, 700.0))
    Yu = (ex_u * c[:, :, None]) * t_mask[None, None, :]               # (d,m,t)

    # joint projection: blockdiag(Λ_s, T_s). The operator action closes in
    # the joint basis [U_s | V_s | v_{k+1}] (module docstring), so the
    # Lemma-3.4 evaluation over it is the TRUE full residual: compressed
    # part over the active prefix m+k, boundary via subdiag = β_k.
    P = m + K
    Hj = jnp.zeros((d, P, P), pdt)
    im = jnp.arange(m)
    Hj = Hj.at[:, im, im].set(lam.astype(pdt))
    Hj = lax.dynamic_update_slice(Hj, H, (0, m, m))
    Yj = jnp.concatenate([Yu.astype(pdt), Yv], axis=1)                # (d,P,t)
    btil_j = jnp.concatenate([c.astype(pdt), btil], axis=1)           # (d,P)

    terms = residual_norm_sq(Hj, Yj, btil_j, m + k, weights, beta)
    rel_est = jnp.sqrt(terms.r_norm_sq) / b_norm
    boundary_rel_sq = terms.boundary_sq / (b_norm * b_norm)
    return rel_est, boundary_rel_sq, Yu, Yv, weights


def _evaluate_host(dg, od, btil, beta, k, lam, c, b_norm, lam_min,
                   omega, alpha, t_mask):
    """Host (numpy) twin of `_evaluate` — exact-size, no padding.

    Rationale: at flagship scale the device projected stage (batched K×K
    f64 eigh + joint Lemma-3.4) crashes this machine's tunneled TPU worker
    (both the mixed-tridiagonal and the emulated dense eigh; reproduced at
    n=131072, K≥769), while the Lanczos segments themselves run fine. The
    checkpoint algebra is tiny (k ≤ ~1e3), so `eigh_impl='host'` runs it in
    scipy/numpy between jitted segments: per-factor tridiagonal eigh, then
    the O(d²t²) rank-pair contraction in longdouble — the reference's own
    MVnorm strategy (/root/reference/src/utils.jl:255-324), which on host
    costs microseconds and gains ~3 decades on the cancellation floor.
    Returns (rel, boundary_rel_sq, Yu, Yv, weights) with device-compatible
    padded shapes."""
    from scipy.linalg import eigh_tridiagonal

    ld = np.longdouble
    d, K = dg.shape
    m = lam.shape[1]
    tmax = omega.shape[0]
    act = np.flatnonzero(t_mask > 0)
    t = act.size
    gam = alpha[act] / lam_min                                  # (t,)
    w_t = (omega[act] / lam_min)                                # (t,)

    Yv_k = np.zeros((d, k, t))
    Zv_k = np.zeros((d, k, t))
    for s in range(d):
        w_s, Q_s = eigh_tridiagonal(dg[s, :k], od[s, 1:k])
        g = Q_s.T @ btil[s, :k]
        ex = np.exp(-np.clip(w_s[:, None] * gam[None, :], -700.0, 700.0))
        Yv_k[s] = Q_s @ (ex * g[:, None])
        Zv_k[s] = Q_s @ ((w_s[:, None] * ex) * g[:, None])      # T_s @ Yv

    ex_u = np.exp(-np.clip(lam[:, :, None] * gam[None, None, :], -700.0, 700.0))
    Yu_k = ex_u * c[:, :, None]                                 # (d, m, t)
    Zu_k = lam[:, :, None] * Yu_k

    # joint per-mode factors [U-block; V-block] and their Grams (longdouble)
    Y = np.concatenate([Yu_k, Yv_k], axis=1)                    # (d, m+k, t)
    Z = np.concatenate([Zu_k, Zv_k], axis=1)
    bt = np.concatenate([c, btil[:, :k]], axis=1)               # (d, m+k)
    Gy = np.einsum("dpi,dpj->dij", Y, Y).astype(ld)
    Gz = np.einsum("dpi,dpj->dij", Z, Z).astype(ld)
    Xg = np.einsum("dpi,dpj->dij", Y, Z).astype(ld)             # YᵀZ
    yb = np.einsum("dpi,dp->di", Y, bt).astype(ld)
    zb = np.einsum("dpi,dp->di", Z, bt).astype(ld)
    b2 = np.prod(np.einsum("dp,dp->d", bt, bt).astype(ld))
    wl = np.asarray(w_t, ld)

    # ‖Hy‖²: modes contribute Gz (s=s'=mode), X (one of them), Gy (neither)
    hy2 = ld(0.0)
    for s in range(d):
        for sp in range(d):
            P = np.ones((t, t), ld)
            for mo in range(d):
                if mo == s and mo == sp:
                    P *= Gz[mo]
                elif mo == s:
                    P *= Xg[mo].T                                # ⟨Z_i, Y_j⟩
                elif mo == sp:
                    P *= Xg[mo]                                  # ⟨Y_i, Z_j⟩
                else:
                    P *= Gy[mo]
            hy2 += wl @ P @ wl
    # ⟨Hy, b̃⟩
    ip = ld(0.0)
    for s in range(d):
        P = np.ones((t,), ld)
        for mo in range(d):
            P *= zb[mo] if mo == s else yb[mo]
        ip += wl @ P
    r_comp_sq = hy2 - 2.0 * ip + b2

    # boundary: last V-row of each mode, excluded-product Grams
    yr = Yv_k[:, k - 1, :].astype(ld)                           # (d, t)
    boundary = ld(0.0)
    for s in range(d):
        E = np.ones((t, t), ld)
        for mo in range(d):
            if mo != s:
                E *= Gy[mo]
        bg = np.outer(yr[s], yr[s]) * ld(beta[s]) ** 2
        boundary += wl @ (bg * E) @ wl
    boundary = float(boundary)

    rel = float(np.sqrt(boundary + max(float(r_comp_sq), 0.0))) / b_norm
    brs = boundary / (b_norm * b_norm)

    # pad back to device conventions: (d, K, tmax) columns masked by t_mask
    Yv = np.zeros((d, K, tmax))
    Yu = np.zeros((d, m, tmax))
    Yv[:, :k, act] = Yv_k
    Yu[:, :, act] = Yu_k
    weights = np.zeros((tmax,))
    weights[act] = w_t
    return rel, brs, Yu, Yv, weights


def _evaluate_host_recorded(dg, od, btil, beta, k, lam, c, b_norm, lam_min,
                            omega, alpha, t_mask, W, Cm, dev, b0_norms,
                            dev0, eps_elem, lam_gersh_f, gram_dev,
                            frechet: bool = True):
    """Host evaluation for the v2 (noise-recording) df64 solve.

    The projected per-factor operator is the RECORDED perturbed matrix

        H~_s = [[Lambda_s, C_s], [0, T_s + W_s]]

    (still a Kronecker-sum factor — the sweep/projection coefficients are
    per-factor, so the exp-sum inverts the recorded operator at the SAME
    CP rank; the r3 flagship's 9.8e-6 unrecorded-sweep gap does not exist
    in this formulation). The solve applies exp(-gamma H~_s) via the exact
    symmetric eigendecomposition of T plus a first-order Frechet
    correction in (W, C) with an explicit second-order remainder charged
    to the certificate (r2_term; (gamma rho)^2-scale — negligible at the
    measured noise levels but accounted).

    Returns (rel_estimate, boundary_rel_sq, Yu, Yv, weights, components)
    where components is the certificate decomposition:
      sup        — analytic exp-sum sup|1 - x g(x)| on [1, kappa] (passed
                   in by the caller via components later; 0.0 here)
      boundary   — sqrt(sum beta^2 ||y_L||^2)/||b|| (measured, positive)
      dev_term   — the recorded commit deviations' triangle bound
      eta_term   — expansion-arithmetic elementwise noise triangle bound
                   (eps_elem MEASURED in-process by eft_selfcheck)
      r2_term    — second-order Frechet remainder bound
      rho        — max_s ||[C_s; W_s]||_F (perturbation magnitude evidence)
    All Gram contractions run in longdouble (~1e-19 floor, DESIGN.md §6).

    Behavioural reference for the residual algebra:
    /root/reference/src/utils.jl:255-324,402-443."""
    from scipy.linalg import eigh_tridiagonal

    ld = np.longdouble
    d, K = dg.shape
    m = lam.shape[1]
    tmax = omega.shape[0]
    act = np.flatnonzero(t_mask > 0)
    t = act.size
    gam = alpha[act] / lam_min                                  # (t,)
    w_t = (omega[act] / lam_min)                                # (t,)

    Yv_k = np.zeros((d, k, t))
    Zv_k = np.zeros((d, k, t))
    Yu_k = np.zeros((d, m, t))
    Zu_k = np.zeros((d, m, t))
    rho = 0.0
    for s in range(d):
        T_w, Q = eigh_tridiagonal(dg[s, :k], od[s, 1:k])
        Ws = np.asarray(W[s, :k, :k], np.float64)
        Cs = np.asarray(Cm[s, :, :k], np.float64)
        rho_s = float(np.sqrt((Ws ** 2).sum() + (Cs ** 2).sum()))
        rho = max(rho, rho_s)
        g = Q.T[:, 0] * b0_norms[s]                             # Qᵀ(β₀e₀)
        Wt = Q.T @ Ws @ Q                                       # (k, k)
        Ct = Cs @ Q                                             # (m, k)
        ex = np.exp(-np.clip(T_w[:, None] * gam[None, :], -700.0, 700.0))
        Yv0 = Q @ (ex * g[:, None])                             # (k, t)
        ex_u = np.exp(-np.clip(lam[s][:, None] * gam[None, :], -700.0, 700.0))
        Yu0 = ex_u * c[s][:, None]                              # (m, t)
        dYv = np.zeros((k, t))
        dYu = np.zeros((m, t))
        # divided differences from the PRECOMPUTED exponentials (ex, ex_u):
        # the naive per-(j, pair) exp evaluation costs m*k*t exps — minutes
        # of host time per flagship checkpoint, during which the tunneled
        # TPU worker sits idle (a measured crash window). The separated
        # form needs only the (k+m)*t exps already computed; the small-gap
        # branch falls back to the stable sinhc form per pair.
        if frechet:
            # GEMM-separated divided differences: with Gw = M_pert ∘ g-row,
            #   Σ_l Gw[i,l]·(ex[i,j] − ex[l,j])/dT[i,l]
            #     = ex[i,j]·rowsum(Gw/dT)[i] − (Gw/dT) @ ex
            # — two dense GEMMs over ALL exp-sum terms at once instead of a
            # k²-temp per term (the per-term loop was ~1 min of idle-tunnel
            # host time per flagship checkpoint). Phi multiplies the TINY
            # recorded perturbation, so the direct quotient's cancellation
            # error (~eps/|γ·dT| relative) is harmless for all but (near-)
            # coincident pairs, which are patched with the sinhc limit.
            dT = T_w[:, None] - T_w[None, :]
            dU = lam[s][:, None] - T_w[None, :]
            scale_T = np.abs(T_w).max() + 1.0
            Gw = Wt * g[None, :]
            deg = np.abs(dT) < 1e-8 * scale_T             # incl. the diagonal
            M = np.where(deg, 0.0, Gw) / np.where(deg, 1.0, dT)
            dYv_c = ex * M.sum(axis=1)[:, None] - M @ ex  # (k, t)
            # (near-)degenerate pairs: phi -> -γ·sqrt(ex_i·ex_l)·sinhc
            for i, l in zip(*np.nonzero(deg)):
                h = 0.5 * gam * (T_w[i] - T_w[l])
                dYv_c[i] += Gw[i, l] * (-gam * np.sqrt(ex[i] * ex[l])
                                        * (1.0 + h * h / 6.0))
            dYv = Q @ dYv_c
            Gu = Ct * g[None, :]
            degU = np.abs(dU) < 1e-8 * scale_T
            MU = np.where(degU, 0.0, Gu) / np.where(degU, 1.0, dU)
            dYu = ex_u * MU.sum(axis=1)[:, None] - MU @ ex
            for i, l in zip(*np.nonzero(degU)):
                h = 0.5 * gam * (lam[s][i] - T_w[l])
                dYu[i] += Gu[i, l] * (-gam * np.sqrt(ex_u[i] * ex[l])
                                      * (1.0 + h * h / 6.0))
        Yv_k[s] = Yv0 + dYv
        Yu_k[s] = Yu0 + dYu
        # Z = H~ Y with the FULL recorded relation
        Tf = np.zeros((k, k))
        idx = np.arange(k)
        Tf[idx, idx] = dg[s, :k]
        Tf[idx[1:], idx[1:] - 1] = od[s, 1:k]
        Tf[idx[1:] - 1, idx[1:]] = od[s, 1:k]
        Zv_k[s] = (Tf + Ws) @ Yv_k[s]
        Zu_k[s] = lam[s][:, None] * Yu_k[s] + Cs @ Yv_k[s]

    # ---- longdouble Gram algebra over the joint factors ----
    Y = np.concatenate([Yu_k, Yv_k], axis=1)                    # (d, m+k, t)
    Z = np.concatenate([Zu_k, Zv_k], axis=1)
    bt = np.zeros((d, m + k))
    bt[:, :m] = c
    bt[:, m] = b0_norms                                         # β₀ e₀
    Gy = np.einsum("dpi,dpj->dij", Y, Y).astype(ld)
    Gz = np.einsum("dpi,dpj->dij", Z, Z).astype(ld)
    Xg = np.einsum("dpi,dpj->dij", Y, Z).astype(ld)
    yb = np.einsum("dpi,dp->di", Y, bt).astype(ld)
    zb = np.einsum("dpi,dp->di", Z, bt).astype(ld)
    b2 = np.prod(np.einsum("dp,dp->d", bt, bt).astype(ld))
    wl = np.asarray(w_t, ld)

    hy2 = ld(0.0)
    for s in range(d):
        for sp in range(d):
            P = np.ones((t, t), ld)
            for mo in range(d):
                if mo == s and mo == sp:
                    P *= Gz[mo]
                elif mo == s:
                    P *= Xg[mo].T
                elif mo == sp:
                    P *= Xg[mo]
                else:
                    P *= Gy[mo]
            hy2 += wl @ P @ wl
    ip = ld(0.0)
    for s in range(d):
        P = np.ones((t,), ld)
        for mo in range(d):
            P *= zb[mo] if mo == s else yb[mo]
        ip += wl @ P
    r_comp_sq = hy2 - 2.0 * ip + b2

    yr = Yv_k[:, k - 1, :].astype(ld)
    boundary = ld(0.0)
    for s in range(d):
        E = np.ones((t, t), ld)
        for mo in range(d):
            if mo != s:
                E *= Gy[mo]
        bg = np.outer(yr[s], yr[s]) * ld(beta[s]) ** 2
        boundary += wl @ (bg * E) @ wl
    boundary = float(boundary)

    # ---- relation-error terms (dev measured; eta from measured eps) ----
    # per-step bounds b_k on the unrecorded relation error ||e_k||:
    #   dev[s, k]                     measured commit deviation (exact)
    #   8*eps_elem*(lam_g + |a| + b)  expansion elementwise rounding
    #   2^-24*(||w||_1 + ||c||_1)     f32 rounding of the RECORDED W, C
    kk = np.arange(1, k + 1)
    absW1 = np.abs(np.asarray(W[:, :, :k], np.float64)).sum(axis=1)  # (d, k)
    absC1 = np.abs(np.asarray(Cm[:, :, :k], np.float64)).sum(axis=1)
    eta_hat = (8.0 * eps_elem
               * (lam_gersh_f[:, None] + np.abs(dg[:, :k]) + od[:, kk - 1]
                  + od[:, kk])
               + 2.0 ** -24 * (absW1 + absC1))                  # (d, k)
    dev_b = dev[:, 1 : k + 1]                                   # (d, k)
    # RHS-side representation term: b⊥_s = β₀ v₀ + dev0_s (host split,
    # eps64-grade) — charged relative to each factor's own b⊥ norm
    b0_term = float(np.sum(dev0 / np.maximum(b0_norms, 1e-300)))
    # column norms of Y per mode (for the off-mode products), with the
    # measured Gram slack of the stored basis folded in multiplicatively
    slack = float(np.sqrt(1.0 + min(k, 1e9) * max(gram_dev, 0.0)))
    # per-mode column norms ||y_i||_r from the joint Gram diagonals
    ynorm = np.sqrt(np.maximum(
        np.einsum("dii->di", np.asarray(Gy, np.float64)), 0.0))  # (d, t)
    off_prod = np.ones((d, t))
    for s in range(d):
        for r in range(d):
            if r != s:
                off_prod[s] *= ynorm[r] * slack

    def tri_term(bmat):
        tot = 0.0
        for s in range(d):
            Dsi = np.abs(Yv_k[s]).T @ bmat[s]                   # (t,) via (k,t)ᵀ(k,)
            tot += float(np.sum(np.abs(w_t) * Dsi * off_prod[s]))
        return tot

    dev_term = tri_term(dev_b) * slack / b_norm + b0_term
    eta_term = tri_term(eta_hat) * slack / b_norm
    # second-order Frechet remainder: per exp-sum term j and factor, the
    # exp-perturbation series tail is <= (gam_j rho)^2/2 e^{gam_j rho}
    # (||e^{-gam T}|| <= 1, T PSD); y-error in b~-units, residual scaled
    # by lambda_max of the joint operator, d factors each chargeable
    lam_max_tot = float(np.sum(lam_gersh_f))
    gr = gam * rho
    r2_term = float(d * lam_max_tot * np.sum(
        w_t * 0.5 * gr * gr * np.exp(np.minimum(gr, 50.0))))

    rel = float(np.sqrt(boundary + max(float(r_comp_sq), 0.0))) / b_norm
    brs = boundary / (b_norm * b_norm)

    Yv = np.zeros((d, K, tmax))
    Yu = np.zeros((d, m, tmax))
    Yv[:, :k, act] = Yv_k
    Yu[:, :, act] = Yu_k
    weights = np.zeros((tmax,))
    weights[act] = w_t
    components = {
        "boundary": float(np.sqrt(max(boundary, 0.0))) / b_norm,
        "dev_term": dev_term,
        "eta_term": eta_term,
        "r2_term": r2_term,
        "rho": float(rho),
        "gram_dev": float(gram_dev),
        "eps_elem": float(eps_elem),
    }
    return rel, brs, Yu, Yv, weights, components


def _u_lift(U, Yu):
    """U·Yu → (d, n, t); U is (1, n, m) shared or (d, n, m) distinct.
    Chunked over U columns (f64-emulation splat budget, ops/orth.py)."""
    from .ops.orth import _proj_col_chunk

    n, m = U.shape[1], U.shape[2]
    # distinct-factor U slices are (d, n, C): budget d-aware (ADVICE r3)
    C = _proj_col_chunk(U.shape[0] * n, m)
    out = None
    for c0 in range(0, m, C):
        if U.shape[0] == 1:
            term = jnp.einsum("nm,dmt->dnt", U[0, :, c0:c0 + C].astype(Yu.dtype),
                              Yu[:, c0:c0 + C, :])
        else:
            term = jnp.einsum("dnm,dmt->dnt", U[:, :, c0:c0 + C].astype(Yu.dtype),
                              Yu[:, c0:c0 + C, :])
        out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=())
def _assemble(U, V, Yu, Yv, k):
    """Real-space CP factors: U·Yu + V·Yv (V (K·d, n) k-major, columns < k).
    Chunked over V columns for the same f64-emulation splat budget as the
    sweep; the U-lift goes through the chunked deflation-project-style
    einsums implicitly (small Yu)."""
    from .ops.orth import _proj_col_chunk

    d, K = Yv.shape[0], Yv.shape[1]
    n = V.shape[1]
    mask = (jnp.arange(K) < k).astype(Yv.dtype)
    Yvm = Yv * mask[None, :, None]
    C = _proj_col_chunk(d * n, K)
    xv = jnp.zeros((d, n, Yv.shape[2]), Yv.dtype)
    for c0 in range(0, K, C):
        Cc = min(C, K - c0)
        Vc = V[c0 * d:(c0 + Cc) * d].reshape(Cc, d, n)
        xv = xv + jnp.einsum(
            "kdn,dkt->dnt", Vc.astype(Yv.dtype), Yvm[:, c0:c0 + Cc, :]
        )
    return _u_lift(U, Yu) + xv


def solve_deflated(
    op: KroneckerSumOperator,
    b,
    config: Optional[SolverConfig] = None,
    *,
    m: int = 64,
    basis: Optional[DeflationBasis] = None,
    tables: Optional[BHTables] = None,
    checkpoints: Optional[Sequence[int]] = None,
    certify: bool = True,
    storage: str = "auto",
    mesh=None,
    comm: str = "gspmd",
    state_cache: Optional[str] = None,
    project_every: int = 1,
    verbose: bool = False,
    pass2_impl: str = "auto",
    segment: int = 32,
    sweep_every: int = 1,
    final: str = "auto",
    save_state: bool = True,
    save_every: int = 0,
) -> DeflatedResult:
    """Solve A x = b (SPD Kronecker sum, rank-1 b) with per-factor spectral
    deflation of rank m. Host-orchestrated: jitted Lanczos segments between
    geometric checkpoints, a jitted joint-basis residual at each checkpoint,
    stop when `config.tol` is certified or `config.kmax` is exhausted.

    `basis`: pass a precomputed DeflationBasis to amortize the setup across
    solves (m is then ignored).

    storage: 'full' keeps the (K·d, n) basis on device (enables auto-
    reorth; one pass; big f64 jit args — small/medium problems only on
    TPU, see BASELINE.md r3 X64Split). 'twopass' never materializes the
    basis — the recurrence is rerun once after convergence to accumulate
    the solution (O(d·n·t) memory, no kmax ceiling, crash-resumable via
    state_cache; NO reorthogonalization — estimates only at large k,
    measured stall in BASELINE.md r3). 'segmented' stores per-segment
    blocks with boundary reorth (intermediate). 'df64' (v2, r4 — THE
    certifying mode on TPU) is the noise-recording expansion Lanczos:
    basis stored as f32 hi/lo pairs, the recurrence in f32-expansion
    arithmetic (measured ~2.6e-16 elementwise on this chip), per-step
    full reorthogonalization with every sweep/projection coefficient and
    commit deviation RECORDED; the projected solve inverts the recorded
    perturbed per-factor operator, and the certificate is sup + measured
    boundary/dev/eta/r2 components with a full-Gram orthonormality bound
    at the deciding checkpoint (see _Df64State and DESIGN.md r4 addendum).
    'auto' → 'twopass' on TPU, 'full' elsewhere.

    mesh: a ('factor', 'mode') jax.sharding.Mesh (parallel.make_mesh) to
    shard the solve: every n-sized array — b⊥, the deflation basis U, the
    recurrence vectors, the stored/replayed Krylov columns, the solution
    accumulator — shards its mode axis; the SpMV halo exchanges and every
    U-projection/dot reduction become XLA collectives over 'mode' (psum /
    collective-permute on ICI). The k-sized checkpoint algebra stays
    replicated (or on host, eigh_impl='host'), exactly like solve_sharded.
    comm: 'gspmd' (XLA chooses collectives from the shardings) or 'ring'
    (every SpMV runs the explicit shard_map + ppermute halo path,
    parallel/halo.py). SURVEY.md §2.14.2; BASELINE.json config 5.

    state_cache (storage='twopass' or 'df64'): path to an .npz where the
    recurrence state is persisted after every completed checkpoint segment,
    and resumed from on the next call with matching shapes/strides. For
    twopass that is the tridiagonal + the two live vectors (~45 MB at
    flagship size); for df64 it is the FULL recording state including the
    active f32-pair basis prefix (~2·k·d·n·4 bytes — ~2.6 GB at the
    flagship deciding checkpoint; f32 transfers, no X64-split tax), so a
    resumed certified solve continues bit-exactly. Built for this machine's
    flaky tunneled TPU worker, which dies after ~10-16 min of activity
    (BASELINE.md r4): a crashed flagship solve restarts from its last
    checkpoint instead of step 0 (reference analogue: experiment
    persistence, /root/reference/experiments/experiment_common.jl:115-143).

    project_every (storage='twopass'): run the U-projection every p-th step
    only (see _advance_light — the projection GEMM dominates the flagship
    step; drift control does not need it every step). The measured
    pre-projection leak is returned as DeflatedResult.projection_leak.

    final ('auto'|'host'|'device', storage='df64' only): where the solution
    assembly + certify cross-check run. 'host' (the r4 behaviour) pulls the
    full f32-pair basis to numpy — ~4 GB at flagship size, which at this
    tunnel's MEASURED 1.6 MB/s pull rate (r5 probe) is ~45 min of transfer
    and reliably outlives the worker. 'device' assembles x = U·Yu + V·Yv in
    chunked pair-GEMMs on device and runs the basis-free CP cross-check
    there too (utils/cp.py:cp_residual_cross_check_device), pulling only
    the (d, 1+2t, 1+2t) small Gram (~2.6 MB); the result's x keeps its
    factors on device. 'auto' → 'host' (unchanged default).

    save_state: set False to use state_cache as resume-only (no writes).
    The df64 state save pulls the ~k·d·n·8-byte basis prefix — sound on a
    directly-attached TPU, but at this tunnel's 1.6 MB/s pull rate a
    single flagship save costs longer than the worker's ~10-16 min life;
    the r5 flagship recipe resumes from an existing checkpoint and accepts
    restart-from-cache as the failure mode instead of saving.
    """
    config = config or SolverConfig()
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != op.d or b.shape[1] != op.n:
        raise ValueError(f"b must be (d, n) = ({op.d}, {op.n}), got {b.shape}")
    if not op.symmetric:
        raise ValueError("solve_deflated requires a symmetric operator")
    if config.orth == "arnoldi":
        raise ValueError("solve_deflated is a Lanczos-family solver")
    basis = basis or deflation_basis(op, m, dtype=config.basis_dtype)
    m = basis.m
    tables = tables or load_tables(dtype=config.proj_dtype)
    pdt = config.proj_dtype
    reorth = {
        "lanczos": "never",
        "lanczos_reorth": "always",
        "lanczos_reorth_auto": "auto",
    }[config.orth]
    eigh_impl = config.eigh_impl
    if eigh_impl == "auto":
        eigh_impl = "tridiag_mixed" if jax.default_backend() == "tpu" else "dense"

    lam_np = np.asarray(basis.lam, np.float64)
    lam_min = float(lam_np[:, 0].sum())
    lam_gersh_f = _gershgorin_per_factor(op)
    lam_max = float(lam_gersh_f.sum())

    # the spectral interval is FIXED for the whole solve (exact λ_min from
    # the deflated pairs, Gershgorin λ_max) → select the exp-sum
    # coefficients once, and price the analytic sup bound once (f128 host).
    # Selection targets tol/2 so the sup component leaves room for the
    # measured boundary part in the certificate tol = sup + boundary.
    kappa = lam_max / lam_min
    half_tol = 0.5 * config.tol
    coeff_tol = half_tol / kappa if config.coeff_tol_scale == "kappa" else half_tol
    coeffs = jax.jit(
        select_bh, static_argnames=("tmax", "row_select")
    )(jnp.asarray(kappa, pdt), coeff_tol, tables, tmax=config.tmax,
      row_select=config.bh_row_select)
    sup_err = expsum_sup_error(coeffs.omega, coeffs.alpha, kappa)

    # the deflated Krylov space lives in the U-complement: dimension ≤ n − m
    kmax = min(config.kmax, op.n - m)
    if checkpoints is None:
        checkpoints, ck = [], 32
        while ck < kmax:
            checkpoints.append(ck)
            ck *= 2
        checkpoints.append(kmax)
    checkpoints = sorted({min(int(c_), kmax) for c_ in checkpoints})

    # the deflated driver runs fully in the projected dtype (f64): the
    # certificate's orthonormality slack is eps(basis); narrower storage
    # cannot certify 1e-8-class targets (docs/northstar.md §4).
    # Split b on HOST (numpy — avoids device temporaries before the big
    # state allocation) and allocate the (d, K, n) basis BEFORE anything
    # else device-side: the TPU allocator needs a CONTIGUOUS HBM block for
    # it, and f64-emulation temporaries fragment the arena quickly.
    bands_host = np.asarray(op.bands, np.float64)   # for host certify
    U_np = np.asarray(basis.U, np.float64)
    b_np = np.asarray(b, np.float64)
    b_host = b_np.copy()
    if U_np.shape[0] == 1:
        c_np = np.einsum("nm,dn->dm", U_np[0], b_np)
        b_perp_np = b_np - np.einsum("nm,dm->dn", U_np[0], c_np)
    else:
        c_np = np.einsum("dnm,dn->dm", U_np, b_np)
        b_perp_np = b_np - np.einsum("dnm,dm->dn", U_np, c_np)
    b_norm = float(np.prod(np.linalg.norm(b_np, axis=1)))

    if storage == "auto":
        storage = "twopass" if jax.default_backend() == "tpu" else "full"
    if storage not in ("full", "twopass", "segmented", "df64"):
        raise ValueError(
            "storage must be 'auto'|'full'|'twopass'|'segmented'|'df64', "
            f"got {storage!r}"
        )
    if storage == "df64":
        # per-step FULL reorthogonalization against the df64-pair basis
        # happens inside the advance kernel
        reorth = "never"
        if mesh is not None and comm == "ring":
            # the expansion-arithmetic SpMV (triple_spmv_pairs) shifts via
            # jnp.roll — GSPMD lowers that to collective-permutes over
            # 'mode'; the explicit shard_map ring has no pair variant
            raise ValueError("storage='df64' with mesh supports comm='gspmd' "
                             "only (the pair SpMV shards via GSPMD)")
    if storage == "twopass":
        # no basis to sweep against; drift is measured (btil probe) instead
        reorth = "never"
    if storage == "segmented":
        # in-segment steps are sweep-free; FULL reorthogonalization happens
        # at every segment boundary against the stored segment list
        reorth = "never"
        if mesh is not None:
            raise ValueError("storage='segmented' does not support mesh yet")
        segment = int(segment)
        if segment < 1:
            raise ValueError(f"segment must be >= 1, got {segment}")
        # never RAISE kmax above config.kmax / the Krylov-space dimension
        # (ADVICE r3: kmax < segment used to round UP into exhausted steps)
        segment = min(segment, kmax)
        kmax = (kmax // segment) * segment
        checkpoints = sorted({
            min(max(segment, (ck // segment) * segment), kmax)
            for ck in checkpoints
        })

    if final == "auto":
        final = "host"
    if final not in ("host", "device"):
        raise ValueError(f"final must be 'auto'|'host'|'device', got {final!r}")
    if final == "device" and storage != "df64":
        raise ValueError("final='device' is implemented for storage='df64'")
    if comm not in ("gspmd", "ring"):
        raise ValueError(f"comm must be 'gspmd' or 'ring', got {comm!r}")
    if pass2_impl == "auto":
        pass2_impl = (
            "host"
            if eigh_impl == "host" and storage == "twopass" and mesh is None
            else "device"
        )
    if pass2_impl not in ("host", "device"):
        raise ValueError(f"pass2_impl must be 'auto'|'host'|'device', got {pass2_impl!r}")
    if pass2_impl == "host" and (storage != "twopass" or mesh is not None):
        raise ValueError("pass2_impl='host' requires storage='twopass' and no mesh")

    # resume BEFORE any device work: a fully-resumed twopass solve with host
    # checkpoint algebra and host pass-2 never touches the device at all —
    # the crash-recovery path on this machine's flaky tunneled TPU worker.
    if state_cache is not None and storage not in ("twopass", "df64"):
        raise ValueError("state_cache requires storage='twopass' or 'df64'")
    # problem fingerprint (ADVICE r4 medium): the shape/m/stride check alone
    # accepts a cache from a solve with different kappa/shift/seed/b — same
    # n, d, m, kmax — and silently resumes it into a wrong-but-'certified'
    # result. Saved caches carry this hash; loads reject a mismatch.
    # Legacy (r4) caches lack the field and load with a warning.
    import hashlib as _hashlib

    _fp_h = _hashlib.sha256()
    _fp_h.update(bands_host.tobytes())
    _fp_h.update(np.asarray(op.offsets, np.int64).tobytes())
    _fp_h.update(b_perp_np.tobytes())
    _fp_h.update(lam_np.tobytes())
    problem_fp = _fp_h.hexdigest()
    del _fp_h
    resume_np = None
    resume_df64_np = None
    resumed_k_prev = 1
    if state_cache is not None and storage == "df64" and os.path.exists(state_cache):
        # df64 crash-resume: the full recording state (incl. the f32-pair
        # basis prefix) persisted at checkpoint boundaries. Motivation: the
        # tunneled TPU worker on this machine dies after ~10-16 min of
        # activity (BASELINE.md r4) — a flagship attempt that cannot resume
        # loses everything; with per-checkpoint persistence each attempt
        # only needs to survive one checkpoint segment.
        z = np.load(state_cache)
        ok = (
            z.get("storage", None) is not None
            and str(z["storage"]) == "df64"
            and z["od"].shape == (op.d, kmax + 1)
            and int(z["n"]) == op.n
            and int(z["m"]) == basis.m
            and int(z["project_every"]) == project_every
            and int(z["sweep_every"]) == sweep_every
        )
        if not ok:
            raise ValueError(
                f"state_cache {state_cache} does not match this df64 solve "
                "(storage/shape/m/stride mismatch — stale cache?)"
            )
        if "fingerprint" in z.files:
            if str(z["fingerprint"]) != problem_fp:
                raise ValueError(
                    f"state_cache {state_cache} was recorded for a DIFFERENT "
                    "problem (operator/RHS/deflation fingerprint mismatch) — "
                    "same shapes, different kappa/shift/seed/b. Refusing to "
                    "resume it into a wrong-but-certified result."
                )
        else:
            print(f"[solve_deflated] WARNING: legacy state_cache "
                  f"{state_cache} has no problem fingerprint; shape checks "
                  "passed but operator/RHS identity is unverified", flush=True)
        resume_df64_np = {f: np.asarray(z[f]) for f in (
            "dg", "od", "btil", "vp_h", "vp_l", "vq_h", "vq_l", "beta",
            "leak", "sweep_overlap", "Vh_act", "Vl_act", "W", "C", "dev",
        )}
        resumed_k_prev = int(z["k_prev"])
    elif state_cache is not None and os.path.exists(state_cache):
        z = np.load(state_cache)
        # ADVICE r4: a twopass solve pointed at a df64-written cache must
        # fall through to the clean stale-cache error, not KeyError on 'vp'
        if ("vp" in z.files and "fingerprint" in z.files
                and str(z["fingerprint"]) != problem_fp):
            raise ValueError(
                f"state_cache {state_cache} was recorded for a different "
                "problem (fingerprint mismatch) — refusing to resume"
            )
        if ("vp" in z.files and z["od"].shape == (op.d, kmax + 1)
                and z["vp"].shape == (op.d, op.n)):
            resume_np = {f: np.asarray(z[f]) for f in
                         ("dg", "od", "btil", "vp", "vpp", "beta")}
            resume_np["leak"] = (
                np.asarray(float(z["leak"])) if "leak" in z else np.asarray(0.0)
            )
            resumed_k_prev = int(z["k_prev"])
            cached_pe = int(z["project_every"]) if "project_every" in z else 1
            if cached_pe != project_every:
                raise ValueError(
                    f"state_cache was recorded with project_every={cached_pe} "
                    f"but this call uses {project_every}: pass-2 must replay "
                    "the exact pass-1 projection schedule"
                )
        else:
            raise ValueError(
                f"state_cache {state_cache} shape mismatch: "
                f"{z['od'].shape} vs {(op.d, kmax + 1)} — stale cache?"
            )
    needs_advance = (max(checkpoints) + 1) > resumed_k_prev
    needs_device = (
        storage in ("full", "segmented", "df64") or mesh is not None
        or needs_advance or pass2_impl == "device"
    )

    mode_sh = basis_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.sharding import _factor_spec

        if "mode" not in mesh.shape:
            raise ValueError("solve_deflated mesh needs a 'mode' axis")
        fs = _factor_spec(mesh, op.d) if "factor" in mesh.shape else None
        mode_sh = NamedSharding(mesh, P(fs, "mode"))           # (d, n)
        basis_sh = NamedSharding(mesh, P(None, "mode"))        # (K*d, n)
        u_sh = NamedSharding(
            mesh, P(None if basis.U.shape[0] == 1 else fs, "mode", None)
        )
        band_sh = NamedSharding(mesh, P(fs, None, "mode"))

    def _put(x, sh):
        return x if sh is None else jax.device_put(x, sh)

    b_perp = U = op_c = state = None
    if needs_device:
        b_perp = _put(jnp.asarray(b_perp_np, pdt), mode_sh)  # shared with init
        if storage == "full":
            state, _ = _init_defl_state(b_perp, kmax + 1, pdt)
            if basis_sh is not None:
                state = state._replace(V=_put(state.V, basis_sh))
        op_c = op.astype(pdt)
        if mesh is not None:
            op_c = dataclasses.replace(
                op_c,
                bands=_put(op_c.bands, band_sh),
                halo=(mesh, "mode", fs) if comm == "ring" else op_c.halo,
            )
        # one explicit transfer (jitted calls re-upload a numpy U per call);
        # the df64 path only touches the f32 pair — skip the f64 copy
        U = None
        if storage != "df64":
            U = _put(jnp.asarray(np.asarray(basis.U), pdt),
                     None if mesh is None else u_sh)
        Uh = Ul = bands_h = bands_l = None
        b0_norms_np = dev0_np = None
        df64_pair_sh = df64_basis_sh = df64_rep_sh = None
        if storage == "df64" and mesh is not None:
            # GSPMD mode sharding of the pair recurrence (VERDICT r4 #5):
            # every n-sized pair buffer shards its mode axis; the sweep /
            # projection einsums contract over n and become psums on ICI;
            # the pair SpMV's rolls lower to collective-permutes. The
            # k-sized recorded algebra (W, C, dg, od, btil, dev) stays
            # replicated — same layout story as solve_sharded.
            from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

            df64_u_sh = _NS(mesh, _P("mode", None))          # (n, m)
            df64_pair_sh = mode_sh                            # (d, n)
            df64_basis_sh = _NS(mesh, _P(None, "mode"))      # (Kp·d, n)
            df64_band_sh = _NS(mesh, _P(fs, None, "mode"))   # (d, nb, n)
            df64_rep_sh = _NS(mesh, _P())                    # small arrays
        if storage == "df64":
            # everything big enters jit as f32 (pairs): no X64-split tax
            U_pair_np = np.asarray(basis.U, np.float64)
            if U_pair_np.shape[0] != 1:
                raise ValueError(
                    "storage='df64' currently requires identical factors "
                    "(shared deflation basis)"
                )
            Uh_np = U_pair_np[0].astype(np.float32)
            Ul_np = (U_pair_np[0] - Uh_np.astype(np.float64)).astype(np.float32)
            Uh = _put(jnp.asarray(Uh_np),
                      None if mesh is None else df64_u_sh)
            Ul = _put(jnp.asarray(Ul_np),
                      None if mesh is None else df64_u_sh)
            del U_pair_np, Uh_np, Ul_np
            bnp = np.asarray(op.bands, np.float64)
            bh_np = bnp.astype(np.float32)
            bands_h = _put(jnp.asarray(bh_np),
                           None if mesh is None else df64_band_sh)
            bands_l = _put(
                jnp.asarray((bnp - bh_np.astype(np.float64)).astype(np.float32)),
                None if mesh is None else df64_band_sh)
            del bnp, bh_np
            # host-exact init: v0 pair + the exact representation deviation
            # dev0 = ||b_perp - beta0 * (vh0 + vl0)||  (charged to dev_term)
            b0_norms_np = np.linalg.norm(b_perp_np, axis=1)
            v0_np = b_perp_np / np.where(b0_norms_np > 0, b0_norms_np, 1.0)[:, None]
            vh0_np = v0_np.astype(np.float32)
            vl0_np = (v0_np - vh0_np.astype(np.float64)).astype(np.float32)
            pair0 = vh0_np.astype(np.longdouble) + vl0_np.astype(np.longdouble)
            dev0_np = np.asarray(np.linalg.norm(
                b_perp_np.astype(np.longdouble)
                - b0_norms_np[:, None] * pair0, axis=1), np.float64)
            d_, n_ = b_perp_np.shape
            K_pad = -(-(kmax + 1) // _DF64_SWEEP_COLS) * _DF64_SWEEP_COLS
            _bsh = None if mesh is None else df64_basis_sh
            _psh = None if mesh is None else df64_pair_sh
            _rsh = None if mesh is None else df64_rep_sh
            Vh0 = _put(jnp.zeros((K_pad * d_, n_), jnp.float32), _bsh)
            Vl0 = _put(jnp.zeros((K_pad * d_, n_), jnp.float32), _bsh)
            Vh0 = lax.dynamic_update_slice(
                Vh0, _put(jnp.asarray(vh0_np), _psh), (0, 0))
            Vl0 = lax.dynamic_update_slice(
                Vl0, _put(jnp.asarray(vl0_np), _psh), (0, 0))
            state = _Df64State(
                _put(jnp.zeros((d_, kmax + 1), pdt), _rsh),
                _put(jnp.zeros((d_, kmax + 1), pdt), _rsh),
                _put(jnp.zeros((d_, kmax + 1), pdt).at[:, 0].set(
                    jnp.asarray(b0_norms_np, pdt)), _rsh),
                _put(jnp.asarray(vh0_np), _psh),
                _put(jnp.asarray(vl0_np), _psh),
                _put(jnp.zeros((d_, n_), jnp.float32), _psh),
                _put(jnp.zeros((d_, n_), jnp.float32), _psh),
                _put(jnp.zeros((d_,), pdt), _rsh),
                _put(jnp.zeros((), pdt), _rsh),
                _put(jnp.zeros((), pdt), _rsh),
                Vh0, Vl0,
                _put(jnp.zeros((d_, K_pad, K_pad), jnp.float32), _rsh),
                _put(jnp.zeros((d_, basis.m, K_pad), jnp.float32), _rsh),
                _put(jnp.zeros((d_, kmax + 1), pdt), _rsh),
            )
            if resume_df64_np is not None:
                r_ = resume_df64_np
                rows_act = r_["Vh_act"].shape[0]
                if rows_act != resumed_k_prev * op.d:
                    raise ValueError(
                        f"state_cache basis prefix has {rows_act} rows but "
                        f"k_prev={resumed_k_prev} implies "
                        f"{resumed_k_prev * op.d} — corrupt cache?"
                    )
                Vh0 = lax.dynamic_update_slice(
                    state.Vh, _put(jnp.asarray(r_["Vh_act"]), _bsh), (0, 0))
                Vl0 = lax.dynamic_update_slice(
                    state.Vl, _put(jnp.asarray(r_["Vl_act"]), _bsh), (0, 0))
                state = _Df64State(
                    _put(jnp.asarray(r_["dg"], pdt), _rsh),
                    _put(jnp.asarray(r_["od"], pdt), _rsh),
                    _put(jnp.asarray(r_["btil"], pdt), _rsh),
                    _put(jnp.asarray(r_["vp_h"]), _psh),
                    _put(jnp.asarray(r_["vp_l"]), _psh),
                    _put(jnp.asarray(r_["vq_h"]), _psh),
                    _put(jnp.asarray(r_["vq_l"]), _psh),
                    _put(jnp.asarray(r_["beta"], pdt), _rsh),
                    _put(jnp.asarray(r_["leak"], pdt), _rsh),
                    _put(jnp.asarray(r_["sweep_overlap"], pdt), _rsh),
                    Vh0, Vl0,
                    _put(jnp.asarray(r_["W"]), _rsh),
                    _put(jnp.asarray(r_["C"]), _rsh),
                    _put(jnp.asarray(r_["dev"], pdt), _rsh),
                )
                del resume_df64_np, r_
        if storage in ("twopass", "segmented"):
            b_norms_d = jnp.linalg.norm(b_perp, axis=1)
            v0 = b_perp / jnp.where(b_norms_d > 0, b_norms_d, 1.0)[:, None]
            # independent buffer: the state (which aliases v0) is DONATED
            # into the advance jit; v0 itself must outlive it for the
            # boundary sweeps and the segmented assembly
            v0_dev = jnp.array(v0, copy=True)
            d_ = op.d
            state = _LightState(
                jnp.zeros((d_, kmax + 1), pdt),
                jnp.zeros((d_, kmax + 1), pdt),
                jnp.zeros((d_, kmax + 1), pdt).at[:, 0].set(b_norms_d),
                v0,
                jnp.zeros_like(v0),
                jnp.zeros((d_,), pdt),
                jnp.zeros((), pdt),
            )
    c = jnp.asarray(c_np, pdt)
    del c_np, b_np

    rel_hist: List[float] = []
    bound_hist: List[float] = []
    status = int(Status.MAXITER)
    k_prev, k_done = 1, 0
    Yu = Yv = weights = None
    if resume_np is not None:
        if needs_device:
            state = _LightState(
                *(jnp.asarray(resume_np[f], pdt)
                  for f in ("dg", "od", "btil", "vp", "vpp", "beta")),
                jnp.asarray(resume_np["leak"], pdt),
            )
        else:
            # host-only recovery path: the state never leaves numpy
            state = _LightState(
                resume_np["dg"], resume_np["od"], resume_np["btil"],
                resume_np["vp"], resume_np["vpp"], resume_np["beta"],
                resume_np["leak"],
            )
        k_prev = resumed_k_prev
    elif resumed_k_prev > 1 and storage == "df64":
        k_prev = resumed_k_prev  # state fields already restored above

    def _save_state(st: _LightState, k_prev: int):
        if state_cache is None or not save_state:
            return
        tmp = state_cache + ".tmp.npz"
        np.savez(
            tmp,
            dg=np.asarray(st.dg), od=np.asarray(st.od),
            btil=np.asarray(st.btil), vp=np.asarray(st.vp),
            vpp=np.asarray(st.vpp), beta=np.asarray(st.beta),
            k_prev=np.asarray(k_prev), leak=np.asarray(st.leak),
            project_every=np.asarray(project_every),
            fingerprint=np.asarray(problem_fp),
        )
        os.replace(tmp, state_cache)

    def _pull_rows_chunked(arr, r0: int, r1: int, max_bytes: int = 1 << 26):
        """Device→host pull of rows [r0, r1) in bounded slices: the r5
        probe measured single pulls at ~20-27 MB/s for <=64 MB pieces but
        collapse (1.6 MB/s) on a 256 MB buffer — chunking keeps each
        transfer in the fast regime and bounds what a worker death can
        lose mid-save."""
        n_cols = arr.shape[1]
        step = max(1, max_bytes // (n_cols * arr.dtype.itemsize))
        parts = []
        r = r0
        while r < r1:
            r2 = min(r + step, r1)
            parts.append(np.asarray(arr[r:r2]))
            r = r2
        return (np.concatenate(parts, axis=0) if parts
                else np.zeros((0, n_cols), arr.dtype))

    def _save_state_df64(st: _Df64State, k_prev: int):
        """Persist the full df64 recording state at a checkpoint boundary.
        Only the ACTIVE basis-prefix rows (< k_prev·d, k-major) are written
        — f32 transfers, no X64-split tax; the small f64 arrays are exact.
        INCREMENTAL (r5): stored basis rows are immutable once written, so
        rows already in the existing cache file are reused from disk and
        only rows [cached_k·d, k_prev·d) are pulled — a flagship save
        fetches ~10 MB/step instead of the whole prefix. Atomic replace."""
        if state_cache is None or not save_state:
            return
        import time as _time

        t0 = _time.perf_counter()
        rows_act = k_prev * op.d
        prev_rows = 0
        prev_Vh = prev_Vl = None
        if os.path.exists(state_cache):
            try:
                z = np.load(state_cache)
                if (str(z.get("storage", "")) == "df64"
                        and "fingerprint" in z.files
                        and str(z["fingerprint"]) == problem_fp
                        and int(z["k_prev"]) <= k_prev):
                    prev_Vh = np.asarray(z["Vh_act"])
                    prev_Vl = np.asarray(z["Vl_act"])
                    prev_rows = min(prev_Vh.shape[0], rows_act)
            except Exception:   # unreadable/corrupt cache → full save
                prev_rows = 0
        new_h = _pull_rows_chunked(st.Vh, prev_rows, rows_act)
        new_l = _pull_rows_chunked(st.Vl, prev_rows, rows_act)
        Vh_act = (np.concatenate([prev_Vh[:prev_rows], new_h])
                  if prev_rows else new_h)
        Vl_act = (np.concatenate([prev_Vl[:prev_rows], new_l])
                  if prev_rows else new_l)
        del prev_Vh, prev_Vl
        tmp = state_cache + ".tmp.npz"
        np.savez(
            tmp,
            storage=np.asarray("df64"),
            n=np.asarray(op.n), m=np.asarray(basis.m),
            k_prev=np.asarray(k_prev),
            project_every=np.asarray(project_every),
            sweep_every=np.asarray(sweep_every),
            dg=np.asarray(st.dg), od=np.asarray(st.od),
            btil=np.asarray(st.btil), beta=np.asarray(st.beta),
            vp_h=np.asarray(st.vp_h), vp_l=np.asarray(st.vp_l),
            vq_h=np.asarray(st.vq_h), vq_l=np.asarray(st.vq_l),
            leak=np.asarray(st.leak),
            sweep_overlap=np.asarray(st.sweep_overlap),
            Vh_act=Vh_act, Vl_act=Vl_act,
            W=np.asarray(st.W), C=np.asarray(st.C), dev=np.asarray(st.dev),
            fingerprint=np.asarray(problem_fp),
        )
        os.replace(tmp, state_cache)
        if verbose:
            print(f"  [solve_deflated] df64 state saved (k={k_prev - 1}, "
                  f"incremental rows {rows_act - prev_rows}, "
                  f"{_time.perf_counter() - t0:.1f}s)", flush=True)

    segs: List[jax.Array] = []
    boundary_drift = None
    cert = None
    for ck in checkpoints:
        if ck + 1 > k_prev:
            if storage == "full":
                state = _advance(
                    op_c, state, b_perp, U, jnp.asarray(k_prev, jnp.int32),
                    jnp.asarray(ck + 1, jnp.int32), reorth=reorth,
                    reorth_tol=config.reorth_tol, project_every=project_every,
                )
                k_prev = ck + 1
            elif storage == "df64":
                # fused noise-recording segments: S steps per device call
                # (VERDICT r3 #4 — the r3 3-calls-per-step structure paid
                # ~3.4 s/step of tunnel dispatch against ~ms of compute)
                S_SEG = 32
                # segment pacing (r5): the tunneled worker dies after
                # ~7-16 min of CONTINUOUS activity (two r5 deaths surfaced
                # at the first blocking pull with ~10 async-dispatched
                # segments queued). Optional sync + idle gaps keep the
                # dispatch queue shallow and give the worker breathing
                # room; env-tunable, off by default.
                pause_every = int(os.environ.get("TK_DF64_PAUSE_EVERY", "0"))
                pause_s = float(os.environ.get("TK_DF64_PAUSE_S", "5"))
                seg_i = 0
                while k_prev <= ck:
                    S_eff = min(S_SEG, ck + 1 - k_prev)
                    state = _df64_advance(
                        bands_h, bands_l, op.offsets, state, b_perp,
                        Uh, Ul, jnp.asarray(k_prev, jnp.int32),
                        S=S_eff, project_every=project_every,
                        sweep_every=sweep_every,
                    )
                    k_prev += S_eff
                    seg_i += 1
                    if (save_every and state_cache is not None and save_state
                            and (k_prev - 1) % save_every == 0
                            and k_prev <= ck):
                        # intra-checkpoint incremental save: bounds what a
                        # worker death can cost to one save_every leg (the
                        # r5 flagship recipe: legs sized under the ~7-11
                        # min death window); doubles as a dispatch sync
                        _save_state_df64(state, k_prev)
                    if pause_every and seg_i % pause_every == 0:
                        import time as _t

                        t_sync0 = _t.perf_counter()
                        jax.block_until_ready(state.beta)
                        if verbose:
                            print(f"  [solve_deflated] paced sync at "
                                  f"k={k_prev - 1} "
                                  f"({_t.perf_counter() - t_sync0:.1f}s), "
                                  f"idling {pause_s:.0f}s", flush=True)
                        _t.sleep(pause_s)
                _save_state_df64(state, k_prev)
            elif storage == "segmented":
                while k_prev <= ck:
                    state, Vseg = _advance_light_store(
                        op_c, state, b_perp, U,
                        jnp.asarray(k_prev, jnp.int32),
                        project_every=project_every, S=segment,
                    )
                    segs.append(Vseg)
                    k_prev += segment
                    state, bd = _boundary_reorth([v0_dev] + segs, state, U)
                    boundary_drift = max(boundary_drift or 0.0, bd)
            else:
                state = _advance_light(
                    op_c, state, b_perp, U, jnp.asarray(k_prev, jnp.int32),
                    jnp.asarray(ck + 1, jnp.int32),
                    project_every=project_every,
                )
                k_prev = ck + 1
            _save_state(state, k_prev) if storage == "twopass" else None
        if storage == "df64":
            # pull only the ACTIVE W/C columns (recorded at steps <= ck) and
            # zero-pad on host: at this tunnel's 1.6 MB/s pull rate the full
            # (d, m, Kp) C buffer is ~30 s/checkpoint of dead transfer
            Kp_ = state.W.shape[1]
            W_np = np.zeros(state.W.shape, np.float32)
            W_np[:, :, : ck + 1] = np.asarray(state.W[:, :, : ck + 1])
            C_np2 = np.zeros(state.C.shape, np.float32)
            C_np2[:, :, : ck + 1] = np.asarray(state.C[:, :, : ck + 1])

            def _eval_df64(gram_dev, frechet):
                out = _evaluate_host_recorded(
                    np.asarray(state.dg), np.asarray(state.od),
                    np.asarray(state.btil), np.asarray(state.beta), ck,
                    np.asarray(basis.lam), np.asarray(c), b_norm, lam_min,
                    np.asarray(coeffs.omega), np.asarray(coeffs.alpha),
                    np.asarray(coeffs.t_mask),
                    W_np, C_np2,
                    np.asarray(state.dev), b0_norms_np, dev0_np,
                    _eft_eps(), lam_gersh_f, gram_dev, frechet=frechet,
                )
                cert = out[-1]
                cert["sup"] = sup_err
                if frechet:
                    bound = (sup_err + cert["boundary"] + cert["dev_term"]
                             + cert["eta_term"] + cert["r2_term"])
                else:
                    # uncorrected y: the measured longdouble estimate (which
                    # contains the W/C defect) replaces sup + boundary
                    bound = (out[0] + cert["dev_term"] + cert["eta_term"]
                             + cert["r2_term"])
                return out, bound

            # interim checkpoints run the CHEAP evaluation (no Frechet
            # correction — ~1 min of idle-tunnel host time saved per
            # checkpoint at flagship size — and proxy slack from the
            # measured sweep-overlap/leak); the full treatment (corrected
            # solve + chunked full Gram) runs at the deciding checkpoint
            proxy = max(float(state.sweep_overlap), float(state.leak))
            out, bound = _eval_df64(proxy, frechet=False)
            if bound < 100.0 * config.tol or ck == checkpoints[-1]:
                gram_dev = _df64_gram_deviation_host(
                    state.Vh, state.Vl, ck + 1, op.d)
                out, bound = _eval_df64(gram_dev, frechet=True)
                out[-1]["gram_source"] = "measured full Gram"
            else:
                out[-1]["gram_source"] = "proxy max(sweep_overlap, leak)"
            rel, brs, Yu, Yv, weights, cert = out
        elif eigh_impl == "host":
            rel, brs, Yu, Yv, weights = _evaluate_host(
                np.asarray(state.dg), np.asarray(state.od),
                np.asarray(state.btil), np.asarray(state.beta), ck,
                np.asarray(basis.lam), np.asarray(c), b_norm, lam_min,
                np.asarray(coeffs.omega), np.asarray(coeffs.alpha),
                np.asarray(coeffs.t_mask),
            )
            bound = sup_err + float(np.sqrt(max(float(brs), 0.0)))
        else:
            rel, brs, Yu, Yv, weights = _evaluate(
                state.dg, state.od, state.btil, state.beta,
                jnp.asarray(ck, jnp.int32), basis.lam, c,
                jnp.asarray(b_norm, pdt), jnp.asarray(lam_min, pdt),
                coeffs.omega, coeffs.alpha, coeffs.t_mask,
                eigh_impl=eigh_impl,
            )
            bound = sup_err + float(np.sqrt(max(float(brs), 0.0)))
        rel_hist.append(float(rel))
        bound_hist.append(bound)
        k_done = ck
        if verbose:
            import time as _time

            extra = ""
            if cert is not None:
                extra = (f" [sup {sup_err:.1e} bnd {cert['boundary']:.1e} "
                         f"dev {cert['dev_term']:.1e} eta {cert['eta_term']:.1e} "
                         f"rho {cert['rho']:.1e} gram {cert['gram_dev']:.1e}]")
            print(f"  [solve_deflated {_time.strftime('%H:%M:%S')}] k={ck}: "
                  f"estimate {rel_hist[-1]:.3e}, "
                  f"certified bound {bound_hist[-1]:.3e}{extra}", flush=True)
        if bound_hist[-1] < config.tol:
            status = int(Status.CONVERGED)
            break

    # compress to the ACTIVE exp-sum columns before assembly: the padded
    # (tmax,) buffers carry ~3× dead columns (t_mask zeros) that would
    # otherwise triple the pass-2 accumulator and the certificate's Gram.
    # All small state is materialized to HOST first, so a device fault in
    # pass-2 can no longer lose the recorded solve.
    act = np.flatnonzero(np.asarray(coeffs.t_mask) > 0)
    Yu_np = np.asarray(Yu)[:, :, act]
    Yv_np = np.asarray(Yv)[:, :, act]
    weights = np.asarray(weights)[act]
    od_np = np.asarray(state.od)
    btil_np = np.asarray(state.btil)
    leak_val = float(state.leak) if hasattr(state, "leak") else None
    n_probes = min(16, max(k_done - 1, 1))
    audit = None
    device_check = None
    if storage == "full":
        xf = _assemble(U, state.V, jnp.asarray(Yu_np), jnp.asarray(Yv_np),
                       jnp.asarray(k_done, jnp.int32))
    elif storage == "df64" and final == "device":
        # device assembly + device cross-check: at this tunnel's measured
        # 1.6 MB/s pull rate the host path's basis pull (~4 GB at flagship
        # size) is ~45 min of transfer against a ~10-16 min worker life.
        # Here x = U·Yu + V·Yv is accumulated on device in bounded pair-GEMM
        # chunks, the basis-free CP residual Gram runs on device
        # (cp_residual_cross_check_device), and only the (d, 1+2t, 1+2t)
        # small Gram (~2.6 MB) crosses the tunnel.
        K_ = od_np.shape[1]
        d_, n_ = b_perp_np.shape
        mask = (np.arange(K_)[None, :, None] < k_done)
        Yv_m = Yv_np * mask
        boundary_drift = float(state.sweep_overlap)
        t_act = Yv_m.shape[2]
        Kp_rows = state.Vh.shape[0] // d_
        ROWS = _DF64_SWEEP_COLS
        nch_a = min(-(-k_done // ROWS), Kp_rows // ROWS)
        Yv_pad = np.zeros((d_, nch_a * ROWS, Yv_m.shape[2]), np.float64)
        Yv_pad[:, : min(K_, nch_a * ROWS), :] = Yv_m[:, : nch_a * ROWS, :]
        Yvh_np = Yv_pad.astype(np.float32)
        Yvl_np = (Yv_pad - Yvh_np.astype(np.float64)).astype(np.float32)
        acc_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

            acc_sh = _NS(mesh, _P(fs, "mode", None))
        acc = _put(jnp.zeros((d_, n_, t_act), jnp.float64), acc_sh)
        for ci in range(nch_a):
            k0_ = ci * ROWS
            acc = _df64_assemble_chunk(
                acc, state.Vh, state.Vl, jnp.asarray(k0_ * d_, jnp.int32),
                jnp.asarray(Yvh_np[:, k0_:k0_ + ROWS, :]),
                jnp.asarray(Yvl_np[:, k0_:k0_ + ROWS, :]), rows=ROWS)
        Yuh_np = Yu_np.astype(np.float32)
        Yul_np = (Yu_np - Yuh_np.astype(np.float64)).astype(np.float32)
        CM_U = min(256, m)
        c0_ = 0
        while c0_ < m:
            c1_ = min(c0_ + CM_U, m)
            acc = _df64_ulift_chunk(
                acc, Uh[:, c0_:c1_], Ul[:, c0_:c1_],
                jnp.asarray(Yuh_np[:, c0_:c1_, :]),
                jnp.asarray(Yul_np[:, c0_:c1_, :]))
            c0_ = c1_
        state = None          # release the 2·Kp·d·n f32 basis before the
        Uh = Ul = None        # cross-check Gram materializes its temps
        xf = acc
        if certify:
            from .utils.cp import cp_residual_cross_check_device

            try:
                check = cp_residual_cross_check_device(
                    op, np.asarray(weights, np.float64), xf,
                    _put(jnp.asarray(b_host, jnp.float64), mode_sh))
                device_check = (check.value / b_norm, check.floor / b_norm)
            except jax.errors.JaxRuntimeError as e:
                print("[solve_deflated] device cross-check failed "
                      f"({type(e).__name__}) — certificate evidence kept, "
                      "measured_cp_residual=None", flush=True)
    elif storage == "df64":
        # host assembly from the f32 pair: pull the basis in bounded row
        # chunks (f32 transfers — no split tax), free nothing early (the
        # pair is one buffer) but do all math in numpy f64
        K_ = od_np.shape[1]
        d_, n_ = b_perp_np.shape
        mask = (np.arange(K_)[None, :, None] < k_done)
        Yv_m = Yv_np * mask
        xv = np.zeros((d_, n_, Yv_m.shape[2]))
        rows_per_chunk = max(d_, (1 << 25) // max(n_, 1) // d_ * d_)
        total_rows = (k_done) * d_   # columns 0..k_done-1 suffice (mask)
        r0 = 0
        while r0 < total_rows:
            r1 = min(r0 + rows_per_chunk, total_rows)
            Vc = (np.asarray(state.Vh[r0:r1], np.float64)
                  + np.asarray(state.Vl[r0:r1], np.float64))
            kk0, kk1 = r0 // d_, r1 // d_
            xv += np.einsum("kdn,dkt->dnt", Vc.reshape(kk1 - kk0, d_, n_),
                            Yv_m[:, kk0:kk1, :])
            r0 = r1
        U_host = np.asarray(basis.U, np.float64)
        xf = np.einsum("nm,dmt->dnt", U_host[0], Yu_np) + xv
        boundary_drift = float(state.sweep_overlap)
    elif storage == "segmented":
        # assembly fully ON HOST: at convergence the device holds every
        # segment (~8-11 GB at flagship size) and adding jit-call split
        # temps on top is exactly what OOMs; instead each segment is pulled
        # once, freed on device, and accumulated in numpy — memory falls
        # monotonically and a worker fault cannot lose the solve
        K_ = od_np.shape[1]
        mask = (np.arange(K_)[None, :, None] < k_done)
        Yv_m = Yv_np * mask
        d_, n_ = b_perp_np.shape
        bn_ = np.linalg.norm(b_perp_np, axis=1)
        v0_np = b_perp_np / np.where(bn_ > 0, bn_, 1.0)[:, None]
        xv = v0_np[:, :, None] * Yv_m[:, 0, :][:, None, :]
        for j in range(len(segs)):
            seg_np = np.asarray(segs[j], np.float64).reshape(segment, d_, n_)
            segs[j] = None                       # free the device block
            c0 = 1 + j * segment
            sl = Yv_m[:, c0:c0 + segment, :]
            xv += np.einsum("kdn,dkt->dnt", seg_np[:sl.shape[1]], sl)
        U_host = np.asarray(basis.U, np.float64)
        if U_host.shape[0] == 1:
            xf = np.einsum("nm,dmt->dnt", U_host[0], Yu_np) + xv
        else:
            xf = np.einsum("dnm,dmt->dnt", U_host, Yu_np) + xv
    else:
        K_ = od_np.shape[1]
        mask = (np.arange(K_)[None, :, None] < k_done)
        Yv_m = Yv_np * mask
        if pass2_impl == "device":
            try:
                X, audit = _pass2_accumulate(
                    op_c, b_perp, U, state.od, jnp.asarray(Yv_m),
                    jnp.asarray(k_done - 1, jnp.int32),
                    n_probes=n_probes, project_every=project_every,
                )
                xf = np.asarray(_u_lift(U, jnp.asarray(Yu_np)) + X)
                audit = Pass2Audit(float(audit.gram_max),
                                   float(audit.beta_rel_dev))
            except jax.errors.JaxRuntimeError as e:
                print("[solve_deflated] device pass-2 failed "
                      f"({type(e).__name__}); falling back to host replay",
                      flush=True)
                pass2_impl = "host"
        if pass2_impl == "host":
            X, audit = _pass2_host(
                np.asarray(op.bands, np.float64), op.offsets, b_perp_np,
                np.asarray(basis.U, np.float64), od_np, Yv_m, k_done - 1,
                project_every=project_every, n_probes=n_probes,
                verbose=verbose,
            )
            U_host = np.asarray(basis.U, np.float64)
            if U_host.shape[0] == 1:
                xf = np.einsum("nm,dmt->dnt", U_host[0], Yu_np) + X
            else:
                xf = np.einsum("dnm,dmt->dnt", U_host, Yu_np) + X
    x = CPTensor(weights, xf)
    kk = np.arange(btil_np.shape[1])
    live = (kk >= 1) & (kk <= k_done)
    drift = float(
        np.max(np.abs(btil_np[:, live]) / (btil_np[:, :1] + 1e-300))
    )
    del state  # release the (K, d, n) basis before the certificate's
    # rank-(1+d·t) CP residual materializes (flagship HBM headroom)
    measured = measured_floor = None
    if device_check is not None:
        measured, measured_floor = device_check
    elif certify and final != "device":
        # structured Gram evaluation, fully on host: O(d·n·t) memory, and
        # the only device interaction is pulling xf when it was assembled
        # on-device (host pass-2 produces numpy xf directly)
        from .utils.cp import cp_residual_cross_check_host

        check = cp_residual_cross_check_host(
            bands_host, op.offsets, np.asarray(weights, np.float64),
            np.asarray(xf, np.float64), b_host,
        )
        measured = check.value / b_norm
        measured_floor = check.floor / b_norm
    return DeflatedResult(
        x=x,
        status=status,
        niterations=k_done,
        m=m,
        relative_residual=rel_hist,
        certified_bound=bound_hist,
        checkpoints=list(checkpoints[: len(rel_hist)]),
        measured_cp_residual=measured,
        expsum_sup=sup_err,
        expsum_rank=int(coeffs.rank),
        lambda_min=lam_min,
        lambda_max=lam_max,
        orthogonality_drift=drift,
        cp_residual_floor=measured_floor,
        pass2_gram_max=None if audit is None else float(audit.gram_max),
        pass2_beta_rel_dev=None if audit is None else float(audit.beta_rel_dev),
        projection_leak=(
            float(leak_val) if leak_val is not None else None
        ),
        boundary_drift_max=boundary_drift,
        relation_dev_term=None if cert is None else cert["dev_term"],
        relation_eta_term=None if cert is None else cert["eta_term"],
        relation_r2_term=None if cert is None else cert["r2_term"],
        perturbation_rho=None if cert is None else cert["rho"],
        gram_deviation=None if cert is None else cert["gram_dev"],
        eft_eps_measured=None if cert is None else cert["eps_elem"],
    )
