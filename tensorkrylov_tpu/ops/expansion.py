"""Exact-EFT f32 expansion arithmetic — the TPU-native answer to "certify
below the emulated-f64 floor".

Why this exists (measured, benchmarks/data/f64_emulation_probe_tpu.json):
on this backend the emulated-f64 ELEMENTWISE ops carry ~2^-47 relative
rounding (axpy |eta|/|operand| = 1.4e-14 — ~64 eps64), which is the exact
arithmetic floor the r3 flagship hit (eps_tpu * lambda_max / beta at Lanczos
cancellation events -> true residual 9.8e-6 against a 5.4e-9 bound,
BASELINE.md r3). Native f32 ops, however, are IEEE round-to-nearest and the
classical error-free transformations hold EXACTLY on the chip (probe: TwoSum
and Dekker TwoProd defects identically 0). Building the three-term
recurrence on f32 expansions therefore buys ~2^-71 effective elementwise
precision — 3 decades BELOW true f64 — out of ops the VPU executes at full
rate, while the MXU keeps doing the heavy dots (measured error/mass ~1e-18,
better than true-f64 sequential summation).

Representation: a value x is an unevaluated sum hi + md + lo of f32 arrays,
|md| <= ulp(hi), |lo| <= ulp(md) after renormalization (a "triple", eps ~
2^-71 relative). Pairs (hi, md) are the 48-bit storage format of the df64
basis (deflate.py); triples are the recurrence carry.

Every algorithm below is textbook (Knuth TwoSum, Dekker split/TwoProd,
Priest/Shewchuk renormalization) — implemented on jnp f32 so XLA vectorizes
them; no Pallas needed (elementwise chains fuse).

Reference provenance: the reference runs plain CPU f64
(/root/reference/src/orthogonal_bases.jl:39-67) and never needed this; the
capability it preserves is "certify 1e-9-class solves" on hardware without
native f64.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Triple", "two_sum", "two_prod", "renorm3", "triple_from_f64",
    "triple_to_f64", "pair_from_f64", "triple_add", "triple_add_pair_prod",
    "triple_scale_pair", "triple_sub_f64", "triple_scale_f64",
    "triple_round_pair",
]


class Triple(NamedTuple):
    """Unevaluated f32 sum hi + md + lo (~2^-71 relative after renorm3)."""

    hi: jax.Array
    md: jax.Array
    lo: jax.Array


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b EXACTLY (probe-verified on this TPU)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    """Dekker FastTwoSum — exact when |a| >= |b| (used post-ordering)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLIT = np.float32(4097.0)  # 2^12 + 1 — Veltkamp splitter for f32


def two_prod(a, b):
    """Dekker TwoProd: p + e == a * b EXACTLY (no FMA required; the XLA
    lowering on this chip was probe-verified to preserve exactness)."""
    p = a * b
    ca = _SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = _SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def renorm3(c0, c1, c2, c3=None):
    """Renormalize 3 (or 4) unordered components into a canonical Triple.

    Bottom-up TwoSum distillation (exact) followed by a top-down
    canonicalization. Error model: the result equals the exact input sum to
    within ~2^-72 of the LARGEST component (absolute) — equivalently 2^-71
    relative except under catastrophic cancellation of the inputs, where
    the absolute model is the meaningful one (and is exactly what the
    solver's eta bound consumes)."""
    if c3 is not None:
        c2, t3 = two_sum(c2, c3)
    else:
        t3 = None
    t1, r2 = two_sum(c1, c2)
    t0, r1 = two_sum(c0, t1)
    # value == t0 + r1 + r2 (+ t3) exactly; |r1| <= ulp(t0)
    hi, u = _fast_two_sum(t0, r1)
    rest = r2 if t3 is None else r2 + t3
    md, lo = two_sum(u, rest)
    hi, md = _fast_two_sum(hi, md)
    md, lo = _fast_two_sum(md, lo)
    return Triple(hi, md, lo)


def triple_from_f64(x) -> Triple:
    """Exact f64 -> Triple (f64 has 53 bits; three f32 carry up to 72)."""
    hi = x.astype(jnp.float32)
    r = x - hi.astype(x.dtype)
    md = r.astype(jnp.float32)
    lo = (r - md.astype(x.dtype)).astype(jnp.float32)
    return Triple(hi, md, lo)


def triple_to_f64(t: Triple):
    """Value to f64 (exact pairwise sums in f64 — 53-bit result)."""
    return (t.lo.astype(jnp.float64) + t.md.astype(jnp.float64)
            + t.hi.astype(jnp.float64))


def pair_from_f64(x) -> Tuple[jax.Array, jax.Array]:
    """f64 -> (hi, lo) f32 pair (48-bit; the df64 storage format)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def triple_add(a: Triple, b: Triple) -> Triple:
    """a + b, both triples -> renormalized triple (error ~2^-71 of result)."""
    # merge component-wise by magnitude order hi>md>lo, then distill
    s0, e0 = two_sum(a.hi, b.hi)
    s1, e1 = two_sum(a.md, b.md)
    s2 = a.lo + b.lo
    # fold: s0 + (s1+e0) + (s2+e1)
    t1, f1 = two_sum(s1, e0)
    t2 = (s2 + e1) + f1
    return renorm3(s0, t1, t2)


def triple_add_pair_prod(z: Triple, ah, al, bh, bl, sign=1.0) -> Triple:
    """z + sign * (ah+al)*(bh+bl) for f32 pairs — the recurrence's
    band-times-vector workhorse. The three significant cross products are
    expanded exactly (TwoProd); the al*bl term (~2^-48 of the product) is
    added in plain f32 (its own rounding is ~2^-72 of the product)."""
    sg = jnp.float32(sign)
    p0, e0 = two_prod(ah, bh)
    p1, e1 = two_prod(ah, bl)
    p2, e2 = two_prod(al, bh)
    tail = al * bl + e1 + e2
    # accumulate into z: z + sg*(p0 + (p1+p2+e0) + tail)
    s0, f0 = two_sum(z.hi, sg * p0)
    m1, g1 = two_sum(p1, p2)
    m2, g2 = two_sum(m1, e0)
    s1, f1 = two_sum(z.md, sg * m2)
    s2 = z.lo + sg * (tail + g1 + g2)
    t1, h1 = two_sum(s1, f0)
    t2 = s2 + f1 + h1
    return renorm3(s0, t1, t2)


def triple_scale_pair(v: Triple, sh, sl) -> Triple:
    """v * (sh + sl) for a scalar (or broadcastable) f32 pair."""
    p0, e0 = two_prod(v.hi, sh)
    p1, e1 = two_prod(v.hi, sl)
    p2, e2 = two_prod(v.md, sh)
    tail = v.md * sl + v.lo * sh + e1 + e2
    m1, g1 = two_sum(p1, p2)
    m2, g2 = two_sum(m1, e0)
    return renorm3(p0, m2, tail + g1 + g2)


def triple_sub_f64(z: Triple, x) -> Triple:
    """z - x where x is an f64 array (e.g. an MXU-computed correction).
    x is split exactly into a triple first, so nothing of x is lost."""
    t = triple_from_f64(-x)
    return triple_add(z, t)


def triple_scale_f64(v: Triple, s) -> Triple:
    """v * s for an f64 scalar, split EXACTLY into three f32 components
    (a 48-bit pair split of s would drop 2^-48 * |s| * |v| — measurably
    short of f64; the third component st rides in the tail at full f32
    rate since its contribution is already ~2^-48 of the product)."""
    sh = s.astype(jnp.float32)
    r = s - sh.astype(s.dtype)
    sl = r.astype(jnp.float32)
    st = (r - sl.astype(s.dtype)).astype(jnp.float32)
    p0, e0 = two_prod(v.hi, sh)
    p1, e1 = two_prod(v.hi, sl)
    p2, e2 = two_prod(v.md, sh)
    tail = v.md * sl + v.lo * sh + e1 + e2 + v.hi * st
    m1, g1 = two_sum(p1, p2)
    m2, g2 = two_sum(m1, e0)
    return renorm3(p0, m2, tail + g1 + g2)


def triple_round_pair(v: Triple):
    """Triple -> storage pair (hi, md') plus the dropped f64 remainder
    norm input: returns ((hi, md'), dropped) where dropped = lo' as f64 —
    the EXACT per-element storage rounding (hi + md' + dropped == value)."""
    hi, t = _fast_two_sum(v.hi, v.md)
    md, lo = _fast_two_sum(t, v.lo)
    hi2, md2 = _fast_two_sum(hi, md)
    return (hi2, md2), lo.astype(jnp.float64)
