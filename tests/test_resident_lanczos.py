"""Resident multi-step Lanczos kernel (interpret mode) vs the plain
recurrence — validates the kernel math on CPU; throughput is measured on
the chip by bench.py."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tensorkrylov_tpu as tk
import tensorkrylov_tpu.ops.pallas.resident_lanczos as rl


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        rl.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(rl, "_resident_steps_chunk",
                        rl._resident_steps_chunk.__wrapped__)


def _plain_steps(op, vp, vpp, beta, S):
    """f32 reference recurrence (same ops, XLA)."""
    from tensorkrylov_tpu.ops.banded import spmv

    Vs, als, bts = [], [], []
    for _ in range(S):
        u = spmv(op, vp) - beta[:, None] * vpp
        alpha = jnp.sum(u * vp, axis=1)
        u = u - alpha[:, None] * vp
        bnew = jnp.sqrt(jnp.sum(u * u, axis=1))
        v = u / bnew[:, None]
        Vs.append(v)
        als.append(alpha)
        bts.append(bnew)
        vp, vpp, beta = v, vp, bnew
    return (jnp.stack(Vs), jnp.stack(als, 1), jnp.stack(bts, 1),
            vp, vpp, beta)


@pytest.mark.parametrize("S", [1, 3, 7])
def test_resident_lanczos_matches_plain(interpret_mode, S):
    op = tk.laplace(2, 512, shift=5.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((2, 512)).astype(np.float32)
    vp = jnp.asarray(b / np.linalg.norm(b, axis=1, keepdims=True))
    vpp = jnp.zeros_like(vp)
    beta = jnp.zeros((2,), jnp.float32)

    V, al, bt, vpn, vppn, bn = rl._resident_steps(
        op.bands, vp, vpp, beta, op.offsets, S)
    Vr, alr, btr, vpr, vppr, br = _plain_steps(op, vp, vpp, beta, S)

    # f32 recurrences diverge bit-wise (different op order) but must agree
    # to f32-accumulation accuracy over a handful of steps
    np.testing.assert_allclose(np.asarray(al), np.asarray(alr),
                               rtol=2e-4, atol=1e-3 * float(jnp.abs(alr).max()))
    np.testing.assert_allclose(np.asarray(bt), np.asarray(btr), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vr),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(vpn), np.asarray(vpr), atol=5e-4)
    np.testing.assert_allclose(np.asarray(bn), np.asarray(br), rtol=2e-4)


def test_resident_lanczos_support_gate():
    assert rl.lanczos_resident_supported(tk.laplace(2, 512, dtype=jnp.float32))
    assert not rl.lanczos_resident_supported(tk.laplace(2, 500, dtype=jnp.float32))
    assert not rl.lanczos_resident_supported(tk.laplace(2, 512))  # f64


def test_solve_host_projected_resident_matches_xla(interpret_mode):
    """step_impl='resident' inside solve_host_projected (VERDICT r4 #4: the
    kernel must be reachable from solve, not only bench.py): same plain-f32
    recurrence as the XLA segment path — estimates agree to f32
    reduction-order roundoff on a well-conditioned problem."""
    import jax.numpy as jnp

    d, n = 2, 128
    op = tk.laplace(d, n, shift=5e4, dtype=jnp.float32)
    b = tk.random_rhs(d, n, seed=3).astype(jnp.float32)
    b = b / jnp.linalg.norm(b, axis=1, keepdims=True)
    cfg = lambda impl: tk.SolverConfig(
        kmax=8, tol=1e-30, check_every=4, orth="lanczos",
        basis_dtype=jnp.float32, step_impl=impl, spectral_source="H")
    r_res = tk.solve_host_projected(op, b, cfg("resident"))
    assert r_res.config.step_impl == "resident", (
        "eligible problem must actually take the resident path")
    r_xla = tk.solve_host_projected(op, b, cfg("xla"))
    rr = np.asarray(r_res.relative_residual)
    rx = np.asarray(r_xla.relative_residual)
    checked = np.isfinite(rx) & (rx > 0)
    # estimates below ~1e-5 sit at the f32 recurrence's own noise floor
    # (reduction-order divergence); compare above it, band the rest
    np.testing.assert_allclose(rr[checked], rx[checked], rtol=2e-3,
                               atol=1e-5)


def test_resident_ineligible_falls_back_recorded():
    import jax.numpy as jnp

    d, n = 2, 100                       # n % 128 != 0 -> unsupported
    op = tk.laplace(d, n, shift=100.0, dtype=jnp.float32)
    b = tk.random_rhs(d, n, seed=3).astype(jnp.float32)
    r = tk.solve_host_projected(
        op, b, tk.SolverConfig(kmax=4, tol=1e-30, check_every=2,
                               orth="lanczos", basis_dtype=jnp.float32,
                               step_impl="resident", spectral_source="H"))
    assert r.config.step_impl == "xla"  # resolved fallback is recorded
