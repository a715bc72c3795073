"""Ring-RDMA Pallas SpMV on an 8-virtual-device CPU mesh (TPU interpret mode
with simulated remote copies + race detection) vs the single-device XLA path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

import tensorkrylov_tpu as tk
from tensorkrylov_tpu.ops.banded import spmv
from tensorkrylov_tpu.ops.pallas.ring_spmv import make_ring_spmv


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:n]), ("mode",))


@pytest.mark.parametrize("gallery,seed", [
    ("laplace", 0),
    pytest.param("conv_diff", 1, marks=pytest.mark.slow),  # same ring path
])
def test_ring_spmv_matches_xla(gallery, seed):
    n = 8 * 256
    op = getattr(tk, gallery)(3, n, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    mesh = _mesh()
    fn = make_ring_spmv(
        mesh, op.offsets, "mode", interpret=pltpu.InterpretParams(detect_races=True)
    )
    out = np.asarray(fn(op.bands, v))
    ref = np.asarray(spmv(op, v))
    # f32 with O(n²) band magnitudes: edge terms sum in a different order
    # (interior-zero + halo correction) than the fused XLA path
    np.testing.assert_allclose(out, ref, rtol=2e-4)


@pytest.mark.slow
def test_ring_spmv_wide_band():
    """Offsets beyond the gallery stencils (|off| up to 7)."""
    n = 8 * 128
    offsets = (-7, -2, 0, 3, 5)
    rng = np.random.default_rng(3)
    bands = rng.standard_normal((2, len(offsets), n)).astype(np.float32)
    for b, off in enumerate(offsets):  # DIA zero-pad convention
        if off > 0:
            bands[:, b, n - off :] = 0.0
        elif off < 0:
            bands[:, b, : -off] = 0.0
    op = tk.KroneckerSumOperator(jnp.asarray(bands), offsets, symmetric=False)
    v = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    mesh = _mesh()
    fn = make_ring_spmv(mesh, offsets, "mode", interpret=pltpu.InterpretParams())
    out = np.asarray(fn(op.bands, v))
    ref = np.asarray(spmv(op, v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
