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
    monkeypatch.setattr(rl, "_resident_steps", rl._resident_steps.__wrapped__)


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
