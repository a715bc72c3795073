"""Measure the TPU backend's emulated-f64 arithmetic accuracy op by op.

The r3 flagship located its 9.8e-6 true-residual floor at "eps_tpu *
lambda_max / beta at cancellation events" with eps_tpu ~ 1.2e-14 measured on
big dots (BASELINE.md r3). The r4 fix (recorded-sweep bookkeeping + modeled
arithmetic terms in the certificate) needs the ERROR MODEL per op class:

  * elementwise add/sub/mul/div   — enter the recurrence relation directly
    (the eta term of A v = V h + U c + beta v' - eta)
  * dot/reduction error vs n      — enter only the RECORDED coefficients
    (harmless for the relation: recorded-as-applied), and the Gram evidence
  * f32 TwoSum / Veltkamp-split EFT validity — whether compensated f32
    expansions are an available escape hatch (f32 ops are native IEEE)

Writes benchmarks/data/f64_emulation_probe.json. Run ON the TPU:
    python benchmarks/f64_emulation_probe.py
(CPU run gives the trivial true-f64 baseline; pass --cpu to force.)
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    rng = np.random.default_rng(0)
    out = {"backend": backend}

    # ---- elementwise ops: compare device f64 against host longdouble ----
    n = 1 << 16
    a = rng.standard_normal(n) * np.exp(rng.uniform(-8, 8, n))
    b = rng.standard_normal(n) * np.exp(rng.uniform(-8, 8, n))
    al, bl = a.astype(np.longdouble), b.astype(np.longdouble)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    def relerr(dev, exact):
        dev = np.asarray(dev, np.longdouble)
        denom = np.maximum(np.abs(exact), np.finfo(np.float64).tiny)
        return float(np.max(np.abs(dev - exact) / denom))

    eps64 = float(np.finfo(np.float64).eps)
    for name, fdev, fex in [
        ("add", lambda: aj + bj, al + bl),
        ("sub", lambda: aj - bj, al - bl),
        ("mul", lambda: aj * bj, al * bl),
        ("div", lambda: aj / bj, al / bl),
    ]:
        e = relerr(jax.jit(fdev)(), fex)
        out[f"elementwise_{name}_relerr"] = e
        print(f"elementwise {name}: max rel err {e:.3e} ({e/eps64:.1f} eps64)",
              flush=True)

    # cancellation stress: (a + t) - a for tiny t — the exact shape of the
    # three-term recurrence at a beta dip (big operands, tiny result)
    t = rng.standard_normal(n) * 1e-10
    big = np.exp(rng.uniform(0, 10, n))
    e = relerr(
        jax.jit(lambda x, y: (x + y) - x)(jnp.asarray(big), jnp.asarray(t)),
        (big.astype(np.longdouble) + t.astype(np.longdouble))
        - big.astype(np.longdouble),
    )
    out["cancellation_addsub_relerr"] = e
    print(f"cancellation (big+tiny)-big: max rel err {e:.3e} "
          f"({e/eps64:.1f} eps64)", flush=True)

    # fused pattern of the recurrence: u = a*v1 - al*v2 - be*v3 elementwise
    v1 = rng.standard_normal(n)
    v2 = rng.standard_normal(n)
    v3 = v1 * 0.999 + 1e-6 * rng.standard_normal(n)  # near-cancelling
    alc, bec = 2.5, 1.7
    ex = (np.longdouble(3.3) * v3.astype(np.longdouble)
          - np.longdouble(alc) * v1.astype(np.longdouble)
          - np.longdouble(bec) * v2.astype(np.longdouble))
    got = jax.jit(lambda x, y, z: 3.3 * z - alc * x - bec * y)(
        jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(v3))
    # absolute error scaled by the OPERAND magnitude (the eta model):
    # eta_i <= C * eps_eff * max_term_i
    scale = np.maximum.reduce([np.abs(3.3 * v3), np.abs(alc * v1),
                               np.abs(bec * v2)]).astype(np.longdouble)
    eta = float(np.max(np.abs(np.asarray(got, np.longdouble) - ex) / scale))
    out["recurrence_axpy_eta_over_operand"] = eta
    print(f"recurrence axpy: max |eta|/|operand| {eta:.3e} "
          f"({eta/eps64:.1f} eps64)", flush=True)

    # ---- dot error vs n (einsum, preferred_element_type=f64) ----
    dots = {}
    for nn in (1 << 10, 1 << 14, 1 << 17, 1 << 20):
        x = rng.standard_normal(nn)
        y = rng.standard_normal(nn)
        ex = float(np.dot(x.astype(np.longdouble), y.astype(np.longdouble)))
        got = float(jax.jit(
            lambda u, v: jnp.einsum("n,n->", u, v,
                                    preferred_element_type=jnp.float64)
        )(jnp.asarray(x), jnp.asarray(y)))
        # normalize by sum|x_i y_i| (the conditioning-free scale)
        mass = float(np.sum(np.abs(x * y)))
        dots[str(nn)] = abs(got - ex) / mass
        print(f"dot n={nn}: |err|/sum|xy| {dots[str(nn)]:.3e}", flush=True)
    out["dot_relerr_vs_n"] = dots

    # ---- f32 EFT validity (native f32 ops must be correctly rounded) ----
    # TwoSum: s = a+b; e = (a - (s - b)) + (b - (s - (s - b)))... use Knuth
    af = rng.standard_normal(n).astype(np.float32)
    bf = (rng.standard_normal(n) * 1e-6).astype(np.float32)

    def twosum(x, y):
        s = x + y
        bb = s - x
        err = (x - (s - bb)) + (y - bb)
        return s, err

    s, e_ = jax.jit(twosum)(jnp.asarray(af), jnp.asarray(bf))
    exact = af.astype(np.float64) + bf.astype(np.float64)
    recon = np.asarray(s, np.float64) + np.asarray(e_, np.float64)
    max_eft = float(np.max(np.abs(recon - exact)))
    out["f32_twosum_max_abs_defect"] = max_eft
    print(f"f32 TwoSum EFT defect (0 = exact): {max_eft:.3e}", flush=True)

    # Veltkamp split + Dekker product (no FMA needed)
    def twoprod(x, y):
        c = jnp.float32(4097.0) * x  # 2^12+1 splitter for f32
        xh = c - (c - x)
        xl = x - xh
        cy = jnp.float32(4097.0) * y
        yh = cy - (cy - y)
        yl = y - yh
        p = x * y
        err = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
        return p, err

    cf = rng.standard_normal(n).astype(np.float32)
    df = rng.standard_normal(n).astype(np.float32)
    p, e2 = jax.jit(twoprod)(jnp.asarray(cf), jnp.asarray(df))
    exactp = cf.astype(np.float64) * df.astype(np.float64)
    reconp = np.asarray(p, np.float64) + np.asarray(e2, np.float64)
    max_tp = float(np.max(np.abs(reconp - exactp)))
    out["f32_dekker_twoprod_max_abs_defect"] = max_tp
    print(f"f32 Dekker TwoProd defect (0 = exact): {max_tp:.3e}", flush=True)

    path = os.path.join(os.path.dirname(__file__), "data",
                        f"f64_emulation_probe_{backend}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
