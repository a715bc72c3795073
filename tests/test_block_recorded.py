"""Noise-recording block Krylov (block_recorded.py — VERDICT r4 #2/#3).

Densify-oracle pattern (d ≤ 3, n ≤ 48): the certified bound must dominate
the TRUE dense-kron residual, the device cross-check must resolve it, and
the recorded relation must hold column-exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

import tensorkrylov_tpu as tk
from tensorkrylov_tpu.models.gallery import bands_to_dense
from tensorkrylov_tpu.utils.cp import cp_full, kron_matvec_dense


def _problem(d=3, n=32, R=2, shift=20.0, seed=1):
    op = tk.laplace(d, n, shift=shift)
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((R, d, n))
    A0 = np.asarray(bands_to_dense(op))[0]
    lmin = d * float(np.linalg.eigvalsh(A0)[0])
    return op, B, lmin


def _true_rel(op, B, x):
    d, n = op.d, op.n
    R = B.shape[0]
    x_full = cp_full(x)
    b_full = np.zeros(n ** d)
    for r in range(R):
        acc = np.array([1.0])
        for s in range(d):
            acc = np.kron(acc, B[r, s])
        b_full += acc
    Gb = np.einsum("rdn,qdn->drq", B, B)
    bn = float(np.sqrt(np.sum(np.prod(Gb, axis=0))))
    return float(np.linalg.norm(b_full - kron_matvec_dense(op, x_full))) / bn


def test_bound_dominates_true_residual():
    op, B, lmin = _problem()
    res = tk.solve_block_recorded(
        op, B, tk.SolverConfig(kmax=15, tol=1e-30), lam_min=lmin,
        final="host")
    rel_true = _true_rel(op, B, res.x)
    bound = res.certified_bound[-1]
    assert rel_true <= 1.05 * bound + 1e-15
    # the bound is not wildly loose either (recorded relation, not worst-case)
    assert bound <= 50.0 * max(rel_true, res.cp_residual_floor)
    # the measured basis-free cross-check agrees with truth to floor scale
    assert abs(res.measured_cp_residual - rel_true) <= 4 * res.cp_residual_floor


def test_converges_and_certifies():
    op, B, lmin = _problem(d=2, n=48, R=2, shift=2000.0)
    res = tk.solve_block_recorded(
        op, B, tk.SolverConfig(kmax=23, tol=1e-8), lam_min=lmin,
        final="host")
    assert res.converged, (res.certified_bound, res.relative_residual)
    assert res.certified_bound[-1] < 1e-8
    rel_true = _true_rel(op, B, res.x)
    assert rel_true <= 1.05 * res.certified_bound[-1] + 1e-15


def test_device_final_matches_host_final():
    op, B, lmin = _problem(d=2, n=40, R=3, shift=30.0)
    cfg = tk.SolverConfig(kmax=12, tol=1e-30)
    rh = tk.solve_block_recorded(op, B, cfg, lam_min=lmin, final="host")
    rd = tk.solve_block_recorded(op, B, cfg, lam_min=lmin, final="device")
    np.testing.assert_array_equal(np.asarray(rd.certified_bound),
                                  np.asarray(rh.certified_bound))
    xh = np.asarray(rh.x.factors, np.float64)
    xd = np.asarray(rd.x.factors, np.float64)
    np.testing.assert_allclose(xd, xh, rtol=0, atol=1e-12 * np.abs(xh).max())
    band = 2.0 * max(rd.cp_residual_floor, rh.cp_residual_floor)
    assert abs(rd.measured_cp_residual - rh.measured_cp_residual) <= band + 1e-12


def test_ritz_lam_min_fallback():
    op, B, _ = _problem(d=2, n=32, R=2, shift=30.0)
    res = tk.solve_block_recorded(
        op, B, tk.SolverConfig(kmax=15, tol=1e-8), lam_min=None,
        final="host")
    # Ritz interval still produces a working solve and honest measurement
    rel_true = _true_rel(op, B, res.x)
    assert abs(res.measured_cp_residual - rel_true) <= 4 * res.cp_residual_floor


def test_shared_subspace_beats_separate_columns():
    """The config-4 claim: R RHS in ONE shared block space converge in
    fewer total columns than R separate rank-1 solves (BASELINE.md r4
    measured 1.41× at d=3; here just assert the shared space converges
    within the same per-rhs column budget)."""
    op, B, lmin = _problem(d=2, n=48, R=2, shift=2000.0)
    res = tk.solve_block_recorded(
        op, B, tk.SolverConfig(kmax=23, tol=1e-8), lam_min=lmin,
        final="host")
    assert res.converged
    cols_shared = res.niterations * res.R
    # a single-RHS solve of term 0 at the same tolerance
    r1 = tk.solve(op, B[0] / np.linalg.norm(B[0], axis=1, keepdims=True),
                  tk.SolverConfig(kmax=47, tol=1e-8,
                                  identical_factors=False))
    assert cols_shared <= 2 * int(r1.niterations) + 2 * res.R


def test_deflated_block_composition():
    """VERDICT r4 #9: deflation composed with the block recurrence — a
    rank-R solve that STALLS undeflated (kappa too large for the column
    budget) certifies below tol with m>0, in fewer block iterations, and
    the dense-kron oracle confirms the bound."""
    op, B, lmin = _problem(d=2, n=48, R=2, shift=30.0, seed=3)
    cfg = tk.SolverConfig(kmax=23, tol=1e-8)
    r0 = tk.solve_block_recorded(op, B, cfg, lam_min=lmin, final="host")
    rm = tk.solve_block_recorded(op, B, cfg, m=8, final="host")
    assert not r0.converged and r0.certified_bound[-1] > 1e-5
    assert rm.converged and rm.certified_bound[-1] < 1e-8
    assert rm.niterations <= r0.niterations
    rel_true = _true_rel(op, B, rm.x)
    assert rel_true <= 1.05 * rm.certified_bound[-1] + 1e-15
    # measured cross-check resolves it too
    assert abs(rm.measured_cp_residual - rel_true) <= 4 * rm.cp_residual_floor


def test_deflated_block_device_final_matches_host():
    op, B, _ = _problem(d=2, n=40, R=2, shift=30.0, seed=4)
    cfg = tk.SolverConfig(kmax=10, tol=1e-30)
    rh = tk.solve_block_recorded(op, B, cfg, m=6, final="host")
    rd = tk.solve_block_recorded(op, B, cfg, m=6, final="device")
    np.testing.assert_array_equal(np.asarray(rd.certified_bound),
                                  np.asarray(rh.certified_bound))
    xh = np.asarray(rh.x.factors, np.float64)
    xd = np.asarray(rd.x.factors, np.float64)
    np.testing.assert_allclose(xd, xh, rtol=0, atol=1e-12 * np.abs(xh).max())
