"""Bands-resident multi-apply Pallas kernel (interpret mode) vs XLA scan."""
import functools

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tensorkrylov_tpu as tk
import tensorkrylov_tpu.ops.pallas.resident_spmv as rs


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        rs.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(rs, "_multi_apply", rs._multi_apply.__wrapped__)


@pytest.mark.parametrize("m", [1, 2, 5])
def test_resident_multi_apply_matches_xla(interpret_mode, m):
    op = tk.laplace(2, 512, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    scale = 1.0 / (4.0 * (op.n + 1) ** 2)
    out = rs._multi_apply(op.bands, v, op.offsets, m, float(scale))
    ref = rs.spmv_multi_apply_xla(op, v, m, scale)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, (m, err)


def test_resident_multi_apply_conv_diff(interpret_mode):
    op = tk.conv_diff(2, 256, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    scale = 1e-6
    out = rs._multi_apply(op.bands, v, op.offsets, 3, scale)
    ref = rs.spmv_multi_apply_xla(op, v, 3, scale)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, err


def test_resident_fallback_paths():
    # f64 → falls back to the XLA scan silently
    op = tk.laplace(2, 128)
    v = jnp.ones((2, 128))
    out = rs.spmv_multi_apply(op, v, 2, 0.5)
    ref = rs.spmv_multi_apply_xla(op, v, 2, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)
