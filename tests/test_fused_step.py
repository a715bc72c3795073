"""Fused Pallas Lanczos step (interpreter mode) vs the XLA step."""
import functools

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tensorkrylov_tpu as tk
from tensorkrylov_tpu.ops.banded import spmv
from tensorkrylov_tpu.ops.orth import init_state, lanczos_step
import tensorkrylov_tpu.ops.pallas.fused_lanczos as fl


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        fl.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # bypass the jit cache (it would hold the compiled non-interpret version)
    monkeypatch.setattr(fl, "_fused_core", fl._fused_core.__wrapped__)


@pytest.mark.slow
def test_fused_core_matches_jnp(interpret_mode):
    d, n = 3, 512
    op = tk.laplace(d, n, dtype=jnp.float32)
    # scale down: raw Laplace entries are ~4(n+1)^2
    op = tk.KroneckerSumOperator(op.bands / (4.0 * (n + 1) ** 2), op.offsets, True)
    rng = np.random.default_rng(0)
    v_prev = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    v_pprev = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(d), jnp.float32)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)

    u, alpha, beta_sq, ub = fl.fused_lanczos_core(op, v_prev, v_pprev, beta, b, 256)

    w_ref = spmv(op, v_prev) - beta[:, None] * v_pprev
    alpha_ref = jnp.einsum("dn,dn->d", w_ref, v_prev)
    u_ref = w_ref - alpha_ref[:, None] * v_prev
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(beta_sq), np.asarray(jnp.einsum("dn,dn->d", u_ref, u_ref)), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ub), np.asarray(jnp.einsum("dn,dn->d", u_ref, b)), rtol=2e-4, atol=1e-4
    )


@pytest.mark.slow
def test_fused_step_matches_xla_step(interpret_mode):
    d, n, kmax = 2, 256, 6
    op = tk.laplace(d, n, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    f64 = jnp.float64

    st_x, _ = init_state(op, b, kmax, f64, jnp.float32)
    st_f = st_x
    for k in range(1, kmax + 1):
        st_x, _ = lanczos_step(op, st_x, b, k, reorth=False, proj_dtype=f64)
        st_f, _ = lanczos_step(op, st_f, b, k, reorth=False, proj_dtype=f64, fused=True)

    scale = float(jnp.max(jnp.abs(st_x.H)))
    np.testing.assert_allclose(
        np.asarray(st_f.H), np.asarray(st_x.H), rtol=0, atol=3e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(st_f.V), np.asarray(st_x.V), rtol=0, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_f.btil), np.asarray(st_x.btil), rtol=0, atol=5e-4
    )


@pytest.mark.slow
def test_fused_step_bf16_storage(interpret_mode):
    d, n, kmax = 2, 256, 4
    op = tk.laplace(d, n, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    f64 = jnp.float64

    st_x, _ = init_state(op, b, kmax, f64, jnp.bfloat16)
    st_f = st_x
    for k in range(1, kmax + 1):
        st_x, _ = lanczos_step(op, st_x, b, k, reorth=False, proj_dtype=f64)
        st_f, _ = lanczos_step(op, st_f, b, k, reorth=False, proj_dtype=f64, fused=True)
    scale = float(jnp.max(jnp.abs(st_x.H)))
    np.testing.assert_allclose(
        np.asarray(st_f.H), np.asarray(st_x.H), rtol=0, atol=0.05 * scale
    )


@pytest.mark.slow
def test_fused_falls_back_on_f64():
    # f64 basis → compute dtype f64 → Pallas path must be skipped entirely
    d, n = 2, 256
    op = tk.laplace(d, n, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float64)
    st, _ = init_state(op, b, 4, jnp.float64)
    st_f, _ = lanczos_step(op, st, b, 1, reorth=False, proj_dtype=jnp.float64, fused=True)
    st_x, _ = lanczos_step(op, st, b, 1, reorth=False, proj_dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(st_f.V), np.asarray(st_x.V))


@pytest.mark.slow
def test_twopass_fused_recurrence_matches(interpret_mode):
    from tensorkrylov_tpu.twopass import _recurrence_step

    d, n = 2, 256
    op = tk.laplace(d, n, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    v = b / jnp.linalg.norm(b, axis=1, keepdims=True)
    vpp = jnp.zeros_like(v)
    beta = jnp.zeros((d,), jnp.float64)
    f64 = jnp.float64

    v1, a1, b1, bt1 = _recurrence_step(op, v, vpp, beta, b, f64)
    v2, a2, b2, bt2 = _recurrence_step(op, v, vpp, beta, b, f64, fused_tile_width=256)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(bt2), np.asarray(bt1), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=0, atol=5e-5)


def test_fused_tile_selection():
    op = tk.laplace(2, 8192, dtype=jnp.float32)
    assert fl.fused_tile(op, 8192) == 8192
    assert fl.fused_tile(op, 1280) == 256
    assert fl.fused_tile(op, 1000) is None
