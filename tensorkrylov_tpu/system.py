"""User-facing system API — analogue of /root/reference/src/system.jl.

Unlike the reference's solve_tensorized_system (which *discards* the computed
solution and returns only convergence telemetry,
/root/reference/src/system.jl:65-83), ours returns the full SolveResult
including the CP solution.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solver import solve
from .types import KroneckerSumOperator, SolveResult, SolverConfig

__all__ = ["random_rhs", "multiple_rhs", "TensorizedSystem", "solve_tensorized_system"]


def random_rhs(d: int, n: int, seed: int = 0, identical: bool = True, dtype=jnp.float64):
    """Random rank-1 RHS factors (d, n), uniform [0, 1).

    The reference replicates ONE random draw across all d factors
    (/root/reference/src/system.jl:5-11); identical=False gives distinct draws.
    """
    rng = np.random.default_rng(seed)
    if identical:
        b = np.broadcast_to(rng.random(n), (d, n)).copy()
    else:
        b = rng.random((d, n))
    return jnp.asarray(b, dtype)


def multiple_rhs(dims, n: int, seed: int = 0, dtype=jnp.float64):
    """One random rank-1 RHS per problem dimension d in dims — the
    experiment-sweep helper (/root/reference/src/system.jl:13)."""
    return [random_rhs(d, n, seed=seed, dtype=dtype) for d in dims]


@dataclasses.dataclass(frozen=True)
class TensorizedSystem:
    """A Kronecker-sum system with a rank-1 RHS.

    Mirrors /root/reference/src/system.jl:15-43 (b is normalized per factor
    by default, like the reference).
    """

    op: KroneckerSumOperator
    b: jax.Array

    @classmethod
    def create(cls, op: KroneckerSumOperator, b, normalize_rhs: bool = True):
        b = jnp.asarray(b)
        assert b.shape == (op.d, op.n), (b.shape, (op.d, op.n))
        if normalize_rhs:
            b = b / jnp.linalg.norm(b, axis=1, keepdims=True)
        return cls(op, b)

    @property
    def d(self) -> int:
        return self.op.d

    @property
    def n(self) -> int:
        return self.op.n

    def __repr__(self):
        kind = "symmetric" if self.op.symmetric else "nonsymmetric"
        return (
            f"TensorizedSystem(d={self.d}, n={self.n}, {kind}, "
            f"bands={len(self.op.offsets)})"
        )


def solve_tensorized_system(
    system: TensorizedSystem,
    nmax: int = 128,
    orth: str = "lanczos_reorth",
    tol: float = 1e-9,
    config: Optional[SolverConfig] = None,
) -> SolveResult:
    if config is None:
        config = SolverConfig(kmax=nmax, tol=tol, orth=orth)
    return solve(system.op, system.b, config)
