"""Pallas banded-SpMV kernel in interpreter mode (CPU) vs the XLA path."""
import functools

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tensorkrylov_tpu as tk
from tensorkrylov_tpu.ops.banded import spmv
import tensorkrylov_tpu.ops.pallas.banded_spmv as ps


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        ps.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # bypass the jit cache (it would hold the compiled non-interpret version)
    monkeypatch.setattr(ps, "_spmv_pallas", ps._spmv_pallas.__wrapped__)


@pytest.mark.slow  # 1.5 s; conv_diff variant below exercises the same kernel
def test_pallas_spmv_matches_xla(interpret_mode):
    op = tk.laplace(2, 1024, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    out = ps._spmv_pallas(op.bands, v, op.offsets, 256)
    ref = spmv(op, v)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-6


def test_pallas_spmv_conv_diff_bandwidth2(interpret_mode):
    op = tk.conv_diff(2, 512, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    out = ps._spmv_pallas(op.bands, v, op.offsets, 256)
    ref = spmv(op, v)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-6


def test_pallas_wrapper_fallback():
    # odd n → falls back to the jnp path transparently
    op = tk.laplace(2, 1001, dtype=jnp.float32)
    v = jnp.ones((2, 1001), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ps.spmv_pallas(op, v)), np.asarray(spmv(op, v)), rtol=1e-6
    )
