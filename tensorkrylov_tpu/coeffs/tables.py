"""In-jit exponential-sum rank & coefficient selection.

SPD path: gathers from the packed Braess–Hackbusch tables (see
preprocess.py) — replaces the reference's per-iteration CSV/file reads
(/root/reference/src/approximation.jl:44-84,119-147,160-167) with O(1)
device gathers inside the solver loop.

Nonsymmetric path: Stenger sinc-quadrature coefficients computed in-jit on a
masked fixed-width grid (/root/reference/src/approximation.jl:86-107,150-158).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TMAX = 63
DEFAULT_NPZ = os.path.join(os.path.dirname(__file__), "data", "bh_tables.npz")

__all__ = ["BHTables", "load_tables", "select_bh", "select_stenger", "TMAX"]


class BHTables(NamedTuple):
    R_values: jax.Array  # (nR,)
    err: jax.Array       # (nR, TMAX)
    omega: jax.Array     # (nR, TMAX, TMAX)
    alpha: jax.Array     # (nR, TMAX, TMAX)
    grid: jax.Array      # (10, n_orders) int32


@functools.lru_cache(maxsize=2)
def _load_numpy(path: str):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_tables(path: str = DEFAULT_NPZ, dtype=jnp.float64) -> BHTables:
    d = _load_numpy(path)
    return BHTables(
        R_values=jnp.asarray(d["R_values"], dtype),
        err=jnp.asarray(d["err"], dtype),
        omega=jnp.asarray(d["omega"], dtype),
        alpha=jnp.asarray(d["alpha"], dtype),
        grid=jnp.asarray(d["grid"], jnp.int32),
    )


class ExpSumCoeffs(NamedTuple):
    omega: jax.Array   # (tmax,) masked
    alpha: jax.Array   # (tmax,) masked
    t_mask: jax.Array  # (tmax,) 1.0 on active terms
    rank: jax.Array    # int32 — number of active terms
    err: jax.Array     # tabulated/bounded uniform error of the sum


def select_bh(
    kappa: jax.Array, tol, tables: BHTables, tmax: int = TMAX, row_select: str = "ceil"
) -> ExpSumCoeffs:
    """κ → (first_digit, order) → table row (digit fallback pre-baked in
    `grid`), then the smallest rank whose tabulated error ≤ tol. If no rank
    satisfies tol, takes the most accurate available rank (the reference
    errors out); the returned `err` lets the caller detect the shortfall.

    row_select='ceil' (default) picks the smallest tabulated R ≥ κ so the
    whole projected spectrum lies inside the approximation interval [1, R].
    'reference' floors κ to its first significant digit like
    /root/reference/src/approximation.jl:109-116 — which can leave the top
    of the spectrum OUTSIDE [1, R], where the exp-sum error blows up (the
    reference gets away with it because its λ_max over-estimates)."""
    dtype = tables.err.dtype
    kappa = jnp.maximum(kappa.astype(dtype), 2.0)  # table starts at R=2
    order = jnp.floor(jnp.log10(kappa)).astype(jnp.int32)
    scaled = kappa / (10.0 ** order.astype(dtype))
    if row_select == "ceil":
        digit = jnp.ceil(scaled).astype(jnp.int32)
        order = jnp.where(digit > 9, order + 1, order)  # ceil(9.3) → R = 1e^(o+1)
        digit = jnp.where(digit > 9, 1, digit)
    else:
        digit = jnp.floor(scaled).astype(jnp.int32)
    n_orders = tables.grid.shape[1]
    order = jnp.clip(order, 0, n_orders - 1)
    digit = jnp.clip(digit, 1, 9)
    row = tables.grid[digit, order]

    errs = tables.err[row]                      # (TMAX,)
    # ranks beyond the caller's tmax budget are not selectable (truncating
    # the coefficient vectors below would corrupt the sum otherwise)
    avail = jnp.arange(TMAX) < min(tmax, TMAX)
    ok = (errs <= tol) & avail
    any_ok = jnp.any(ok)
    first_ok = jnp.argmax(ok)                   # smallest rank index meeting tol
    best = jnp.argmin(jnp.where(jnp.isfinite(errs) & avail, errs, jnp.inf))
    t_idx = jnp.where(any_ok, first_ok, best)

    omega = tables.omega[row, t_idx]
    alpha = tables.alpha[row, t_idx]
    if tmax > TMAX:
        pad = ((0, tmax - TMAX),)
        omega = jnp.pad(omega, pad)
        alpha = jnp.pad(alpha, pad)
    elif tmax < TMAX:
        omega = omega[:tmax]
        alpha = alpha[:tmax]
    rank = (t_idx + 1).astype(jnp.int32)
    t_mask = (jnp.arange(tmax) < rank).astype(dtype)
    return ExpSumCoeffs(omega, alpha, t_mask, rank, errs[t_idx])


def stenger_eps(rank, dtype=jnp.float64):
    """Uniform-error model 2.75 · exp(−π√(t/2)) of the 2t+1-term sinc rule for
    1/x on [1, ∞). The reference's a-priori bound is this divided by λ_min
    (its target is the error of y, ours the error of the 1/x approximation;
    /root/reference/src/approximation.jl:86)."""
    if hasattr(rank, "astype"):
        rank = rank.astype(dtype)
    return 2.75 * jnp.exp(-jnp.pi * jnp.sqrt(rank / 2.0))


def select_stenger(eps_target: jax.Array, tmax: int = TMAX, dtype=jnp.float64) -> ExpSumCoeffs:
    """Closed-form sinc-rule coefficients (SPD fallback beyond the BH tables,
    and the nonsymmetric path).

    Reference (/root/reference/src/approximation.jl:150-158): with
    h = π/√t and j = −t..t (2t+1 terms):
        α_j = log(e^{jh} + √(1+e^{2jh})) = asinh(e^{jh}),
        ω_j = h/√(1+e^{−2jh}).
    The 2t+1 terms are laid out in slots 0..2t of the fixed (tmax,) grid;
    the half-width t is the smallest with stenger_eps(t) ≤ eps_target,
    clamped to (tmax−1)//2.
    """
    eps_target = jnp.asarray(eps_target, dtype)
    # smallest integer t with eps(t) ≤ eps_target (reference increments from 1)
    arg = jnp.log(2.75 / jnp.maximum(eps_target, 1e-300)) / jnp.pi
    t = jnp.ceil(2.0 * jnp.maximum(arg, 0.0) ** 2).astype(jnp.int32)
    t = jnp.maximum(t, 1)
    # snap to the exact smallest t (guard ceil roundoff): try t-1
    t = jnp.where(stenger_eps(t - 1) <= eps_target, jnp.maximum(t - 1, 1), t)
    t = jnp.minimum(t, (tmax - 1) // 2)

    h = jnp.pi / jnp.sqrt(t.astype(dtype))
    slots = jnp.arange(tmax)
    j = (slots - t).astype(dtype)                      # −t..t in active slots
    n_terms = 2 * t + 1
    mask = (slots < n_terms).astype(dtype)
    jh = jnp.clip(j * h * mask, -700.0, 700.0)
    ejh = jnp.exp(jh)
    alpha = jnp.arcsinh(ejh) * mask
    omega = h / jnp.sqrt(1.0 + jnp.exp(jnp.clip(-2.0 * jh, -700.0, 700.0))) * mask
    return ExpSumCoeffs(omega, alpha, mask, n_terms.astype(jnp.int32), stenger_eps(t))
