"""f32 expansion arithmetic (ops/expansion.py) vs numpy longdouble oracles.

These run on CPU (conftest) where f32 ops are IEEE; the TPU backend's EFT
exactness is separately probe-verified (benchmarks/f64_emulation_probe.py,
committed data: TwoSum/TwoProd defects identically 0 on-chip)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorkrylov_tpu.ops import expansion as ex

ld = np.longdouble
rng = np.random.default_rng(42)


def _tval(t):
    """Triple -> longdouble value (exact)."""
    return (np.asarray(t.hi, ld) + np.asarray(t.md, ld) + np.asarray(t.lo, ld))


def test_two_sum_two_prod_exact():
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * 1e-5).astype(np.float32)
    s, e = jax.jit(ex.two_sum)(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) + b.astype(np.float64))
    p, e2 = jax.jit(ex.two_prod)(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e2, np.float64),
        a.astype(np.float64) * b.astype(np.float64))


def test_triple_roundtrip_f64():
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-30, 30, 1000))
    t = ex.triple_from_f64(jnp.asarray(x))
    back = np.asarray(ex.triple_to_f64(t))
    np.testing.assert_array_equal(back, x)   # f64 fits in 3 f32s exactly


def test_triple_add_relerr():
    x = rng.standard_normal(2000)
    y = rng.standard_normal(2000)
    t = jax.jit(lambda a, b: ex.triple_add(
        ex.triple_from_f64(a), ex.triple_from_f64(b)))(
        jnp.asarray(x), jnp.asarray(y))
    exact = x.astype(ld) + y.astype(ld)
    err = np.abs(_tval(t) - exact)
    scale = np.maximum(np.abs(x), np.abs(y)).astype(ld)
    assert float(np.max(err / scale)) < 2.0**-70


def test_triple_add_cancellation():
    """(big + tiny) - big recovers tiny to ~2^-71 of BIG (the eta model):
    far beyond f64, which loses tiny entirely at 2^-52 of big."""
    big = np.exp(rng.uniform(0, 10, 1000))
    tiny = rng.standard_normal(1000) * 1e-18
    f = jax.jit(lambda b, t: ex.triple_add(
        ex.triple_add(ex.triple_from_f64(b), ex.triple_from_f64(t)),
        ex.triple_from_f64(-b)))
    t = f(jnp.asarray(big), jnp.asarray(tiny))
    err = np.abs(_tval(t) - tiny.astype(ld))
    assert float(np.max(err / big)) < 2.0**-70


def test_pair_prod_accumulate():
    """z + (a_pair)*(b_pair) — the SpMV workhorse — to ~2^-70 of |a*b|."""
    a = rng.standard_normal(2000) * 1e5
    b = rng.standard_normal(2000)
    z0 = rng.standard_normal(2000)

    def f(z, av, bv):
        ah, al = ex.pair_from_f64(av)
        bh, bl = ex.pair_from_f64(bv)
        return ex.triple_add_pair_prod(ex.triple_from_f64(z), ah, al, bh, bl)

    t = jax.jit(f)(jnp.asarray(z0), jnp.asarray(a), jnp.asarray(b))
    # oracle: z + round48(a)*round48(b) — the pair values are the operands
    ah, al = np.float32(a), np.float32(a - np.float64(np.float32(a)))
    bh, bl = np.float32(b), np.float32(b - np.float64(np.float32(b)))
    av = ah.astype(ld) + al.astype(ld)
    bv = bh.astype(ld) + bl.astype(ld)
    exact = z0.astype(ld) + av * bv
    scale = np.maximum(np.abs(av * bv), np.abs(z0)).astype(ld) + 1e-300
    # threshold = max(2^-69, ~2 eps_longdouble): the 80-bit oracle's own
    # product rounding (1.1e-19) is the measurement floor here
    assert float(np.max(np.abs(_tval(t) - exact) / scale)) < 2.5e-19


def test_triple_scale_and_sub():
    v = rng.standard_normal(1000)
    s = np.float64(3.14159e3)
    c = rng.standard_normal(1000) * 1e-8

    def f(vv, cc):
        t = ex.triple_scale_f64(ex.triple_from_f64(vv), jnp.asarray(s))
        return ex.triple_sub_f64(t, cc)

    t = jax.jit(f)(jnp.asarray(v), jnp.asarray(c))
    exact = v.astype(ld) * ld(s) - c.astype(ld)
    scale = np.abs(v.astype(ld) * ld(s)) + np.abs(c)
    # 2.5e-19: the longdouble oracle's own rounding floor (see above)
    assert float(np.max(np.abs(_tval(t) - exact) / scale)) < 2.5e-19


def test_round_pair_exact_remainder():
    """triple_round_pair: hi + md + dropped == value EXACTLY, and (hi, md)
    is a 48-bit representation (dropped <= 2^-47 of value)."""
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-10, 10, 1000))
    t = ex.triple_from_f64(jnp.asarray(x))
    (hi, md), dropped = jax.jit(ex.triple_round_pair)(t)
    recon = (np.asarray(hi, ld) + np.asarray(md, ld)
             + np.asarray(dropped, ld))
    np.testing.assert_array_equal(np.asarray(recon, np.float64), x)
    assert float(np.max(np.abs(np.asarray(dropped)) / np.abs(x))) < 2.0**-46
