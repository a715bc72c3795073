"""Experiment-module unit tests (spectrum enumeration, families)."""
import numpy as np

from tensorkrylov_tpu.experiments.eigenvalue_distribution import (
    clusterzero,
    clusterone,
    kronsum_spectrum,
    kronsum_spectrum_multiset,
    perturb_eigenvalues,
    uniform_eigenvalues,
)


def test_families():
    cz = clusterzero(10)
    assert cz[0] == 0.01 and cz[-1] == 1.0
    co = clusterone(10)
    assert co[0] == 0.01 and abs(co[-1] - 1.0) < 1e-12
    U = uniform_eigenvalues(5, 3, (1.0, 2.0))
    assert U.shape == (3, 5) and not np.allclose(U[0], U[1])


def test_multiset_spectrum_matches_full():
    ev = np.array([1.0, 2.5, 4.0])
    d = 3
    full = np.sort(kronsum_spectrum(np.broadcast_to(ev, (d, 3))))
    vals, counts = kronsum_spectrum_multiset(ev, d)
    assert counts.sum() == 3**d
    recon = np.sort(np.repeat(vals, counts))
    np.testing.assert_allclose(recon, full, rtol=1e-14)


def test_perturbed_spectrum():
    P = perturb_eigenvalues(np.array([1.0, 2.0]), 3, 0.1)
    np.testing.assert_allclose(P[0], [1.1, 2.1])
    np.testing.assert_allclose(P[2], [1.3, 2.3])
