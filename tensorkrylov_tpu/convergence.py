"""Convergence telemetry formatting + export.

Analogue of ConvergenceData (/root/reference/src/convergence.jl): the data
itself lives in SolveResult's padded arrays; this module gives it the
reference's ergonomics (tabular display, trimmed traces) plus JSON export
that the reference lacks.
"""
from __future__ import annotations

import json
from typing import Dict

import numpy as np

from .types import SolveResult, Status

__all__ = ["trim", "summarize", "to_json"]


def trim(result: SolveResult) -> Dict[str, np.ndarray]:
    """Per-iteration traces cut to the actual iteration count (the analogue
    of the reference's resize!, /root/reference/src/convergence.jl:25-32).
    Index i corresponds to subspace size i+1."""
    ni = int(result.niterations)
    sl = slice(1, ni + 1)
    return {
        "iterations": np.arange(1, ni + 1),
        "relative_residual": np.asarray(result.relative_residual)[sl],
        "projected_residual": np.asarray(result.projected_residual)[sl],
        "orthogonality": np.asarray(result.orthogonality)[sl],
        "lambda_min": np.asarray(result.lambda_min)[sl],
        "lambda_max": np.asarray(result.lambda_max)[sl],
        "expsum_rank": np.asarray(result.expsum_rank)[sl],
    }


def summarize(result: SolveResult, every: int = 10) -> str:
    """Human-readable convergence table (cf. the reference's show method,
    /root/reference/src/convergence.jl:34-46)."""
    t = trim(result)
    ni = int(result.niterations)
    status = Status(int(result.status)).name
    lines = [
        f"TensorKrylov solve: {status} after {ni} iterations",
        f"{'k':>5} {'rel.residual':>13} {'proj.residual':>13} {'orth.loss':>10} "
        f"{'λ_min':>10} {'λ_max':>10} {'t':>4}",
    ]
    finite = np.nonzero(np.isfinite(t["relative_residual"]))[0]
    pool = finite if finite.size else np.arange(ni)
    stride = max(len(pool) // max(ni // every, 1), 1)
    idx = list(pool[::stride])
    if pool.size and pool[-1] not in idx:
        idx.append(pool[-1])
    for i in idx:
        lines.append(
            f"{int(t['iterations'][i]):>5} {t['relative_residual'][i]:>13.3e} "
            f"{t['projected_residual'][i]:>13.3e} {t['orthogonality'][i]:>10.2e} "
            f"{t['lambda_min'][i]:>10.3e} {t['lambda_max'][i]:>10.3e} "
            f"{int(t['expsum_rank'][i]):>4}"
        )
    return "\n".join(lines)


def to_json(result: SolveResult) -> str:
    t = trim(result)
    payload = {k: v.tolist() for k, v in t.items()}
    payload["status"] = Status(int(result.status)).name
    payload["niterations"] = int(result.niterations)
    return json.dumps(payload)
