"""CP-tensor utilities: norms, inner products, low-rank operator algebra,
rank reduction, materialization oracles.

Analogues of kronproddot/kronprodnorm/kroneckervectorize and the Kruskal
Gram algebra (/root/reference/src/tensor_struct.jl:271-384); kron_apply_cp /
cp_axpy / cp_round go beyond the reference (which has no CP arithmetic
outside the residual estimator).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import CPTensor, KroneckerSumOperator
from ..models.gallery import bands_to_dense

__all__ = [
    "cp_dot",
    "cp_norm",
    "cp_dot_accurate",
    "cp_norm_accurate",
    "cp_residual_cross_check",
    "cp_residual_cross_check_device",
    "cp_residual_cross_check_host",
    "cp_residual_cross_check_host_rankR",
    "host_spmv_bands",
    "ResidualCrossCheck",
    "cp_full",
    "cp_compress",
    "cp_axpy",
    "cp_round",
    "kron_apply_cp",
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


def cp_dot_accurate(x: CPTensor, y: CPTensor) -> float:
    """⟨x, y⟩ with the rank-pair contraction in extended precision.

    The per-factor Gram matrices are computed in f64 on device (length-n
    inner products — benign), but the weighted sum over rank pairs is
    catastrophically cancellative when the CP terms are large and cancel
    (κ_rep, see refine.py docstring): residual norms of nearly-converged
    solves cancel ~|term mass|² down to ‖r‖². The final Π over modes and the
    Σ over pairs run on host in numpy's extended-precision longdouble
    (80-bit on x86: eps ≈ 5.4e-20), pushing the measurement floor ~3 decades
    below the all-f64 cp_dot."""
    G = np.asarray(
        jnp.einsum("dni,dnj->dij", x.factors.astype(jnp.float64),
                   y.factors.astype(jnp.float64)),
        np.longdouble,
    )
    P = np.prod(G, axis=0)
    wx = np.asarray(x.weights, np.float64).astype(np.longdouble)
    wy = np.asarray(y.weights, np.float64).astype(np.longdouble)
    return float(wx @ P @ wy)


def cp_norm_accurate(x: CPTensor) -> float:
    """‖x‖ via cp_dot_accurate (extended-precision pair contraction)."""
    return float(np.sqrt(max(cp_dot_accurate(x, x), 0.0)))


class ResidualCrossCheck(NamedTuple):
    """Basis-free residual measurement plus its own validity floor.

    `value` is the measured ‖b − A x‖; `floor` = √(eps64 · mass) where
    `mass` = Σ_{ij} |w_i w_j| Π_s |G_s[i,j]| is the CP term mass the
    rank-pair contraction cancelled against. Entries of the per-mode Gram
    matrices carry f64 rounding (~eps64 relative), so the contraction can
    only resolve residuals down to ~√(eps·mass): a measurement at or below
    `floor` means "≤ floor", not the printed value (VERDICT r2 weak #1)."""

    value: float
    floor: float

    def interpret(self) -> str:
        if self.value <= self.floor:
            return f"<= floor {self.floor:.3e} (below measurement floor)"
        return f"{self.value:.3e} (floor {self.floor:.3e})"


def host_spmv_bands(bands: np.ndarray, offsets, V: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.banded.spmv for (d, n, t) column blocks: out[s,:,j]
    = A_s V[s,:,j]. Pure host — used by the certificate cross-check so the
    flagship certify path touches the device not at all."""
    d, nb, n = bands.shape
    out = np.zeros_like(V)
    for bidx, off in enumerate(offsets):
        col = bands[:, bidx, :]                                # (d, n)
        if off == 0:
            out += col[:, :, None] * V
        elif off > 0:
            out[:, : n - off, :] += col[:, : n - off, None] * V[:, off:, :]
        else:
            out[:, -off:, :] += col[:, -off:, None] * V[:, : n + off, :]
    return out


def cp_residual_cross_check_host(
    bands: np.ndarray, offsets, weights: np.ndarray, factors: np.ndarray,
    b: np.ndarray,
) -> ResidualCrossCheck:
    """Pure-numpy core of cp_residual_cross_check (all inputs host arrays)."""
    X = np.asarray(factors, np.float64)
    d, n, t = X.shape
    b = np.asarray(b, np.float64)
    bands = np.asarray(bands, np.float64)
    AX = host_spmv_bands(bands, offsets, X)
    C_np = np.concatenate([b[:, :, None], X, AX], axis=2)     # (d, n, 1+2t)
    G_small = np.einsum("dni,dnj->dij", C_np, C_np).astype(
        np.longdouble
    )                                                          # (d, 1+2t, 1+2t)
    return _cross_check_from_gram(G_small, np.asarray(weights, np.float64), d, t)


def cp_residual_cross_check(op, x: CPTensor, b) -> ResidualCrossCheck:
    """‖b − A x‖ with a validity floor, without materializing the
    rank-(1+d·t) residual.

    Mathematically identical to cp_norm_accurate(cp_residual(op, x, b)) but
    memory-bounded: the residual's mode-s factor matrix has only 1+2t
    DISTINCT columns ([b_s | X_s | A_s X_s]); its (1+d·t)² Gram matrix is an
    indexed view of the (1+2t)² Gram of those columns. The ENTIRE check runs
    on host (numpy): the TPU f64 einsum is software-emulated and was
    measured to inflate the cross-check by ~6 decades (the 1.2e-3 reading
    in the r2 n=8192 artifact), the batched emulated Gram OOMs at flagship
    shape, and a single >1 GB device→host pull crashes this machine's
    tunneled worker — so only the solution factors are transferred,
    per-mode (≤ ~50 MB each at flagship size). The cancellative rank-pair
    contraction runs in host longdouble exactly as cp_dot_accurate. Same
    role as the reference's Lemma-3.4 Gram masking
    (/root/reference/src/utils.jl:255-324), applied to the full-space
    residual."""
    d = x.factors.shape[0]
    X = np.stack([np.asarray(x.factors[s], np.float64) for s in range(d)])
    return cp_residual_cross_check_host(
        np.asarray(op.bands, np.float64), op.offsets,
        np.asarray(x.weights, np.float64), X, np.asarray(b, np.float64),
    )


@jax.jit
def _gram_small_pair_chunk(Cc):
    """(d, nc, R2) f64 column chunk → its (d, R2, R2) Gram contribution via
    the explicit 3-product f32-pair GEMM (hi·hi + hi·lo + lo·hi with exact
    f32 products and f64 accumulation — measured 7.5e-15 relative on this
    TPU, BASELINE.md r3). The naive in-context f64 einsum was measured to
    inflate cross-checks by ~6 decades on this backend (r2 n=8192
    artifact), so the pair form is NOT an optimization — it is the only
    device contraction accurate enough for certificate evidence."""
    Ch = Cc.astype(jnp.float32)
    Cl = (Cc - Ch.astype(jnp.float64)).astype(jnp.float32)
    f64 = jnp.float64
    return (jnp.einsum("dni,dnj->dij", Ch, Ch, preferred_element_type=f64)
            + jnp.einsum("dni,dnj->dij", Ch, Cl, preferred_element_type=f64)
            + jnp.einsum("dni,dnj->dij", Cl, Ch, preferred_element_type=f64)
            + jnp.einsum("dni,dnj->dij", Cl, Cl, preferred_element_type=f64))


@functools.partial(jax.jit, static_argnames=("offsets",))
def _spmv_bands_cols(bands, offsets, X):
    """Device twin of host_spmv_bands for (d, n, t) column blocks, written
    offset-by-offset with jnp.roll + edge masking (elementwise f64 — the
    accurate class of emulated-f64 ops on this chip, ~2^-47)."""
    d, nb, n = bands.shape
    out = jnp.zeros_like(X)
    for bidx in range(nb):
        off = int(offsets[bidx])
        col = bands[:, bidx, :]
        if off == 0:
            out = out + col[:, :, None] * X
        elif off > 0:
            shifted = jnp.roll(X, -off, axis=1)
            mask = (jnp.arange(n) < n - off).astype(X.dtype)
            out = out + (col * mask)[:, :, None] * shifted
        else:
            shifted = jnp.roll(X, -off, axis=1)
            mask = (jnp.arange(n) >= -off).astype(X.dtype)
            out = out + (col * mask)[:, :, None] * shifted
    return out


def cp_residual_cross_check_device(
    op, weights, X_dev, b_dev, n_chunk: int = 16384,
) -> ResidualCrossCheck:
    """cp_residual_cross_check with the O(d·n·t²) Gram computed ON DEVICE,
    pulling only the (d, 1+2t, 1+2t) small Gram (~MBs) to host for the
    cancellative longdouble rank-pair contraction.

    Built for this machine's tunneled TPU worker, whose device→host pull
    rate was measured at ~1.6 MB/s (r5): pulling the (d, n, t) solution
    factors at flagship size (~1 GB) costs ~10 min and reliably outlives
    the worker, while this path transfers ~2.6 MB. X_dev: (d, n, t) f64
    device solution factors; b_dev: (d, n) f64 rank-1 RHS, or (R, d, n)
    for a rank-R tensor-product RHS (the block solvers' evidence —
    device twin of cp_residual_cross_check_host_rankR)."""
    X_dev = jnp.asarray(X_dev, jnp.float64)
    d, n, t = X_dev.shape
    b_dev = jnp.asarray(b_dev, jnp.float64)
    if b_dev.ndim == 2:
        B_cols = b_dev[:, :, None]                      # (d, n, 1)
    else:
        B_cols = jnp.moveaxis(b_dev, 0, 2)              # (R, d, n)→(d, n, R)
    R = B_cols.shape[2]
    bands_dev = jnp.asarray(op.bands, jnp.float64)
    # multi-device X (mode-sharded solve): replicate the small bands over
    # the same mesh so the eager/jit ops see one device set
    x_sh = getattr(X_dev, "sharding", None)
    x_mesh = getattr(x_sh, "mesh", None)
    if x_mesh is not None and getattr(x_mesh, "size", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bands_dev = jax.device_put(bands_dev, NamedSharding(x_mesh, P()))
    AX = _spmv_bands_cols(bands_dev, tuple(int(o) for o in op.offsets), X_dev)
    C_cols = jnp.concatenate([B_cols, X_dev, AX], axis=2)
    R2 = R + 2 * t
    G_dev = jnp.zeros((d, R2, R2), jnp.float64)
    n0 = 0
    while n0 < n:        # host loop: bounds the 8× f32-splat einsum temps
        n1 = min(n0 + n_chunk, n)
        G_dev = G_dev + _gram_small_pair_chunk(C_cols[:, n0:n1, :])
        n0 = n1
    G = np.asarray(G_dev)                       # the ONLY sizeable pull
    # the device Gram entries are pair-GEMM grade, not exact-f64 grade:
    # charge the floor with the measured 4-product pair error bound
    # (~f64-accumulation scale; BASELINE.md r3 measured 7.5e-15 for the
    # 3-product form, the lo·lo term removes its leading omission)
    return _cross_check_from_gram(
        G.astype(np.longdouble), np.asarray(weights, np.float64), d, t,
        R=R, b_weights=np.ones(R), entry_eps=1e-15)


def cp_residual_cross_check_host_rankR(
    bands: np.ndarray, offsets, weights: np.ndarray, factors: np.ndarray,
    B: np.ndarray, b_weights=None,
) -> "ResidualCrossCheck":
    """cp_residual_cross_check_host for a rank-R tensor-product RHS
    b = Σ_r bw_r ⊗_s B[r, s] (B: (R, d, n)) — the block/global solver's
    (BASELINE config 4) certificate evidence. Same longdouble rank-pair
    contraction; per-mode distinct columns are [B_s | X_s | A_s X_s]."""
    X = np.asarray(factors, np.float64)
    d, n, t = X.shape
    B = np.asarray(B, np.float64)
    R = B.shape[0]
    bw = np.ones(R) if b_weights is None else np.asarray(b_weights, np.float64)
    bands = np.asarray(bands, np.float64)
    AX = host_spmv_bands(bands, offsets, X)
    Bc = np.transpose(B, (1, 2, 0))                            # (d, n, R)
    C_np = np.concatenate([Bc, X, AX], axis=2)                 # (d, n, R+2t)
    G_small = np.einsum("dni,dnj->dij", C_np, C_np).astype(np.longdouble)
    return _cross_check_from_gram(G_small, np.asarray(weights, np.float64),
                                  d, t, R=R, b_weights=bw)


def _cross_check_from_gram(G_small, weights, d: int, t: int, R: int = 1,
                           b_weights=None,
                           entry_eps: float = float(np.finfo(np.float64).eps),
                           ) -> ResidualCrossCheck:
    # column map of the full residual factor matrix, per mode s:
    # cols 0..R-1 = B_s; col R+s'·t+j = (A_s X_s)[:, j] if s' == s else X_s[:, j]
    sp = np.repeat(np.arange(d), t)                            # group of col
    jj = np.tile(np.arange(t), d)
    idx = np.empty((d, R + d * t), np.int64)
    idx[:, :R] = np.arange(R)
    for s in range(d):
        idx[s, R:] = np.where(sp == s, R + t + jj, R + jj)
    # weights: r = Σ_r bw_r·b_r − Σ_{s',j} w_j · (A applied in mode s')
    bw = np.ones(R) if b_weights is None else np.asarray(b_weights, np.float64)
    w = np.concatenate([bw, -np.tile(weights, d)]).astype(np.longdouble)

    P = np.ones((R + d * t, R + d * t), np.longdouble)
    P_abs = np.ones_like(P)
    for s in range(d):
        Gs = G_small[s][np.ix_(idx[s], idx[s])]
        P *= Gs
        P_abs *= np.abs(Gs)
    aw = np.abs(w)
    mass = float(aw @ P_abs @ aw)                              # Σ|terms|, norm²
    floor = float(np.sqrt(entry_eps * max(mass, 0.0)))
    value = float(np.sqrt(max(float(w @ P @ w), 0.0)))
    return ResidualCrossCheck(value, floor)


def cp_residual_norm_accurate(op, x: CPTensor, b) -> float:
    """Back-compat wrapper: the measured value of cp_residual_cross_check."""
    return cp_residual_cross_check(op, x, b).value


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


def kron_apply_cp(op: KroneckerSumOperator, x: CPTensor) -> CPTensor:
    """A x in CP form: applying the Kronecker sum Σ_s I⊗…⊗A_s⊗…⊗I to a
    rank-t CP tensor yields a rank-(d·t) CP tensor — term (s, j) applies A_s
    to mode s of term j and copies the other modes. All t columns of each
    mode go through one batched banded SpMV."""
    from ..ops.banded import spmv

    d, n, t = x.factors.shape
    # (d, t, n) → batched SpMV → (d, n, t): applied[s, :, j] = A_s x_s[:, j]
    applied = jnp.swapaxes(spmv(op, jnp.swapaxes(x.factors, 1, 2)), 1, 2)
    # out factor of mode m, term (s, j): applied if m == s else original
    eye = jnp.eye(d, dtype=bool)[:, None, :, None]          # (m, 1, s, 1)
    out = jnp.where(
        eye, applied[:, :, None, :], x.factors[:, :, None, :]
    )  # (m, n, s, t)
    weights = jnp.broadcast_to(x.weights, (d, t)).reshape(d * t)
    return CPTensor(weights, out.reshape(d, n, d * t))


def cp_axpy(alpha, x: CPTensor, y: CPTensor) -> CPTensor:
    """α·x + y as a CP tensor (rank t_x + t_y; no rounding)."""
    weights = jnp.concatenate([alpha * x.weights, y.weights])
    factors = jnp.concatenate([x.factors, y.factors], axis=2)
    return CPTensor(weights, factors)


@functools.partial(jax.jit, static_argnames=("rank", "iters"))
def _cp_round_jit(weights, factors, rank: int, iters: int, ridge: float):
    d, n, T = factors.shape
    dt = factors.dtype
    # normalize target columns; fold norms into the weights
    cn = jnp.linalg.norm(factors, axis=1)                     # (d, T)
    F = factors / jnp.where(cn > 0, cn, 1.0)[:, None, :]
    w = weights * jnp.prod(cn, axis=0)

    # init: the `rank` largest-|weight| terms of the target
    order = jnp.argsort(-jnp.abs(w))[:rank]
    B = F[:, :, order]                                        # (d, n, r)
    lam = w[order]

    def sweep(_, carry):
        B, lam = carry
        for s in range(d):
            GB = jnp.einsum("dni,dnj->dij", B, B)             # (d, r, r)
            C = jnp.einsum("dni,dnj->dij", F, B)              # (d, T, r)
            # Hadamard products over all modes except s
            mask = jnp.arange(d) != s
            ones_r = jnp.ones((rank, rank), dt)
            ones_c = jnp.ones((T, rank), dt)
            Gm = jnp.prod(jnp.where(mask[:, None, None], GB, ones_r), axis=0)
            Cm = jnp.prod(jnp.where(mask[:, None, None], C, ones_c), axis=0)
            # normal equations: (F_s diag(w) Cm) = B_s diag(lam) Gm diag(lam)
            M = jnp.einsum("nt,tr->nr", F[s], w[:, None] * Cm)  # (n, r)
            G = Gm + ridge * jnp.eye(rank, dtype=dt)
            Bs_l = jnp.linalg.solve(G, M.T).T                  # B_s diag(lam)
            lam = jnp.linalg.norm(Bs_l, axis=0)
            Bs = Bs_l / jnp.where(lam > 0, lam, 1.0)[None, :]
            B = B.at[s].set(Bs)
        return B, lam

    B, lam = jax.lax.fori_loop(0, iters, sweep, (B, lam))
    return lam, B


def cp_round(x: CPTensor, rank: int, iters: int = 10, ridge: float = 1e-10) -> CPTensor:
    """Best-effort rank reduction of a CP tensor by ALS fitting (capability
    beyond the reference). Minimizes ‖y − x‖ over rank-`rank` CP tensors y:
    each mode update solves an r×r SPD system assembled from Hadamard
    products of the t×t Gram matrices — O(d·n·T·r + d·r³) per sweep, no
    materialization. Initialized from the `rank` largest-weight terms.

    ridge: Tikhonov shift for near-collinear factor columns (relative scale:
    applied to column-normalized Grams — the init from the largest-weight
    terms routinely contains collinear columns, so keep it nonzero).
    """
    T = x.rank
    if rank >= T:
        return x
    lam, B = _cp_round_jit(x.weights, x.factors, rank, iters, ridge)
    return CPTensor(lam, B)


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
