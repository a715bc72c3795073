"""CP-tensor utilities: norms, inner products, materialization oracles.

Analogues of kronproddot/kronprodnorm/kroneckervectorize and the Kruskal
Gram algebra (/root/reference/src/tensor_struct.jl:271-384).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..types import CPTensor, KroneckerSumOperator
from ..models.gallery import bands_to_dense

__all__ = [
    "cp_dot",
    "cp_norm",
    "cp_full",
    "cp_compress",
    "kron_residual_dense",
    "kron_matvec_dense",
]


def cp_compress(x: CPTensor, rel_tol: float = 0.0) -> CPTensor:
    """Drop CP terms with (near-)zero weight — e.g. the padded columns of a
    solver result or a multi-RHS concatenation. Host-side (dynamic output
    shape). rel_tol is relative to the largest |weight|."""
    w = np.asarray(x.weights)
    f = np.asarray(x.factors)
    if w.size == 0:
        return x
    keep = np.abs(w) > rel_tol * np.abs(w).max()
    if not np.any(keep):
        keep = np.abs(w) == np.abs(w).max()
    return CPTensor(jnp.asarray(w[keep]), jnp.asarray(f[:, :, keep]))


def cp_dot(x: CPTensor, y: CPTensor) -> jnp.ndarray:
    """⟨x, y⟩ = Σ_{ij} λ_i μ_j Π_s ⟨x_s[:,i], y_s[:,j]⟩ — O(d·t²·n)."""
    G = jnp.einsum("dni,dnj->dij", x.factors, y.factors)
    P = jnp.prod(G, axis=0)
    return x.weights @ P @ y.weights


def cp_norm(x: CPTensor) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(cp_dot(x, x), 0.0))


def cp_full(x: CPTensor) -> np.ndarray:
    """Materialize to a length-Π n_s vector (tests/debug only; tiny problems).

    Analogue of kroneckervectorize (/root/reference/src/tensor_struct.jl:361-384).
    """
    factors = np.asarray(x.factors)
    weights = np.asarray(x.weights)
    d, n, t = factors.shape
    out = np.zeros(n**d)
    for j in range(t):
        v = weights[j]
        acc = np.array([1.0])
        for s in range(d):
            acc = np.kron(acc, factors[s, :, j])
        out += v * acc
    return out


def kron_matvec_dense(op: KroneckerSumOperator, v: np.ndarray) -> np.ndarray:
    """Dense oracle: apply the full Kronecker-sum operator to a flat vector."""
    A = bands_to_dense(op)
    d, n, _ = A.shape
    out = np.zeros_like(v)
    x = v.reshape((n,) * d)
    for s in range(d):
        out += np.moveaxis(
            np.tensordot(A[s], x, axes=([1], [s])), 0, s
        ).reshape(-1)
    return out


def kron_residual_dense(op: KroneckerSumOperator, x: CPTensor, b: np.ndarray) -> float:
    """True relative residual ‖Ax − b‖/‖b‖ via full materialization (oracle)."""
    b = np.asarray(b)
    d, n = b.shape
    bfull = np.array([1.0])
    for s in range(d):
        bfull = np.kron(bfull, b[s])
    xfull = cp_full(x)
    r = kron_matvec_dense(op, xfull) - bfull
    return float(np.linalg.norm(r) / np.linalg.norm(bfull))
