"""Plot recipes for convergence traces and spectra.

Rebuild of /root/reference/experiments/plot_general.jl and
plot_eigenvalues.jl (Plots.jl → matplotlib). All functions accept either
SolveResults or the JSON trace dicts written by the experiment modules, and
save to PNG (headless-safe).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..convergence import trim
from ..types import SolveResult

__all__ = ["plot_convergence", "plot_orthogonality", "plot_spectrum_hist"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _trace_of(obj):
    if isinstance(obj, SolveResult):
        t = trim(obj)
        return t["iterations"], t["relative_residual"], t
    rr = np.asarray(obj["relative_residual"])
    return np.arange(1, len(rr) + 1), rr, obj


def plot_convergence(traces: Dict, path: str, title: str = "Relative residual", ylabel: str = r"$\|r\|/\|b\|$"):
    """Log-y relative-residual curves, one per labelled trace
    (cf. /root/reference/experiments/plot_general.jl:31-110)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, obj in traces.items():
        it, rr, _ = _trace_of(obj)
        ax.semilogy(it, rr, label=str(label), linewidth=1.2)
    ax.set_xlabel("iteration k")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)
    return path


def plot_orthogonality(results: Dict[str, SolveResult], path: str):
    """Orthogonality-loss traces (cf. /root/reference/experiments/plot_general.jl:112-150)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, res in results.items():
        t = trim(res)
        ax.semilogy(t["iterations"], np.maximum(t["orthogonality"], 1e-20), label=str(label))
    ax.set_xlabel("iteration k")
    ax.set_ylabel("orthogonality loss estimate")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)
    return path


def plot_spectrum_hist(spectrum: np.ndarray, path: str, bins: int = 80, title: str = "Kronecker-sum spectrum"):
    """Spectrum histogram (cf. /root/reference/experiments/plot_eigenvalues.jl:1-71)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.hist(np.asarray(spectrum), bins=bins)
    ax.set_xlabel(r"$\lambda$")
    ax.set_ylabel("count")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)
    return path
