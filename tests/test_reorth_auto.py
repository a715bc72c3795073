"""On-demand (loss-triggered) reorthogonalization + genuine orthogonality
telemetry across solve paths.

Reference semantics: LanczosReorth runs a full MGS sweep only when
orthogonality_loss > √eps (/root/reference/src/orthogonal_bases.jl:98-139).
Here the trigger probe is |⟨v_k, v_0⟩| (free from b̃_k) and the sweep is a
CGS pass under lax.cond with the basis outside the conditional boundary.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import tensorkrylov_tpu as tk
from tensorkrylov_tpu.ops.orth import init_state, lanczos_step, orthogonality_loss
from tensorkrylov_tpu.types import SolverConfig, Status


def _hard_op_rhs(seed=7, n=48):
    """A spectrum with big gaps → fast Ritz convergence → fast orthogonality
    decay for plain Lanczos."""
    ev = np.concatenate([np.geomspace(1.0, 1e6, n - 4), [2e6, 3e6, 4e6, 5e6]])
    op = tk.eigval_matrix(ev, d=2)
    rng = np.random.default_rng(seed)
    b = rng.normal(size=(2, n))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return op, jnp.asarray(b)


def _run_steps(op, b, k_steps, reorth):
    state, _ = init_state(op, b, k_steps, jnp.float64)
    loss_hist = []
    for k in range(1, k_steps + 1):
        state, loss = lanczos_step(op, state, b, k, reorth=reorth, proj_dtype=jnp.float64)
        loss_hist.append(float(loss))
    return state, loss_hist


@pytest.mark.slow
def test_auto_reorth_restores_orthogonality():
    op, b = _hard_op_rhs()
    k = 40
    st_plain, _ = _run_steps(op, b, k, reorth=False)
    st_auto, _ = _run_steps(op, b, k, reorth="auto")
    loss_plain = float(orthogonality_loss(st_plain.V, k + 1))
    loss_auto = float(orthogonality_loss(st_auto.V, k + 1))
    # plain Lanczos genuinely loses orthogonality on this spectrum...
    assert loss_plain > 1e-4, loss_plain
    # ...and the probe-triggered sweeps keep the auto basis at √eps-level
    # orthogonality (the v_0 probe under-reads the Frobenius loss slightly)
    assert loss_auto < 1e-6, loss_auto


@pytest.mark.slow
def test_auto_matches_always_solution_quality(rng):
    op = tk.laplace(3, 24)
    b = jnp.asarray(rng.normal(size=(3, 24)))
    res_always = tk.solve(op, b, SolverConfig(kmax=24, tol=1e-9, orth="lanczos_reorth"))
    res_auto = tk.solve(op, b, SolverConfig(kmax=24, tol=1e-9, orth="lanczos_reorth_auto"))
    assert int(res_auto.status) == Status.CONVERGED
    ra = tk.kron_residual_dense(op, res_auto.x, np.asarray(b))
    rb = tk.kron_residual_dense(op, res_always.x, np.asarray(b))
    assert ra < 1e-9 and rb < 1e-9


@pytest.mark.slow
def test_probe_telemetry_nonzero_plain():
    """Plain Lanczos must report a measured (nonzero) drift probe, not 0.0
    (round-1 VERDICT weak #4)."""
    op, b = _hard_op_rhs()
    _, loss_hist = _run_steps(op, b, 40, reorth=False)
    arr = np.asarray(loss_hist[5:])
    assert np.all(arr > 0.0)
    assert np.max(arr) > 1e-8  # genuine drift, not a constant epsilon


def test_solver_orthogonality_telemetry_nonzero():
    op, b = _hard_op_rhs()
    res = tk.solve(op, b, SolverConfig(kmax=40, tol=1e-14, orth="lanczos"))
    niter = int(res.niterations)
    orth = np.asarray(res.orthogonality)[1 : niter + 1]
    assert np.all(orth > 0.0)
    # probe tracks the true loss direction: larger late than early
    assert orth[-1] > orth[0]


@pytest.mark.slow
def test_twopass_and_block_telemetry_nonzero(rng):
    op = tk.laplace(2, 24)
    b = jnp.asarray(rng.normal(size=(2, 24)))
    r2 = tk.solve_two_pass(op, b, SolverConfig(kmax=20, tol=1e-10, orth="lanczos"))
    o2 = np.asarray(r2.orthogonality)[1 : int(r2.niterations) + 1]
    assert np.all(o2 > 0.0)

    B = jnp.asarray(rng.normal(size=(2, 2, 24)))
    rb = tk.solve_block(op, B, SolverConfig(kmax=8, tol=1e-10))
    ob = np.asarray(rb.orthogonality)[1 : int(rb.niterations) + 1]
    assert np.all(ob > 0.0)
