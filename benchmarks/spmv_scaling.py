"""SpMV throughput and mode-axis scaling measurement.

Methodology: lax.scan of dependent applies (prevents cross-apply stencil
fusion), two-point slope (m and 4m iterations) to cancel fixed dispatch
overhead — required when the device sits behind a high-latency link.

Run: python benchmarks/spmv_scaling.py [--cpu] [--devices N]
"""
import argparse
import time

import numpy as np


def measure(fn, op, v, iters, jax, jnp):
    def many(o, x, m):
        c = jnp.asarray(1.0 / (4.0 * (op.n + 1) ** 2), x.dtype)

        def body(xc, _):
            return fn(o, xc) * c, ()

        out, _ = jax.lax.scan(body, x, None, length=m)
        return out

    def timed(m):
        g = jax.jit(lambda o, x: many(o, x, m))
        g(op, v).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            g(op, v).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    dt1, dt2 = timed(iters), timed(4 * iters)
    nnz = op.d * op.nnz_per_factor
    return nnz * 3 * iters / max(dt2 - dt1, 1e-12)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--devices", type=int, default=0, help="also measure sharded over N devices")
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--log2n", type=int, default=20)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from tensorkrylov_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import tensorkrylov_tpu as tk
    from tensorkrylov_tpu.ops.banded import spmv

    d, n = args.d, 1 << args.log2n
    op = tk.laplace(d, n, dtype=jnp.float32)
    v = jnp.asarray(np.random.default_rng(0).standard_normal((d, n)), jnp.float32)

    g = measure(spmv, op, v, args.iters, jax, jnp)
    print(f"single-device: {g/1e9:.1f} Gnnz/s")

    if args.devices > 1:
        from tensorkrylov_tpu.parallel import make_mesh, shard_operator, shard_rhs

        mesh = make_mesh(args.devices)
        op_s = shard_operator(op, mesh)
        v_s = shard_rhs(v, mesh)
        gs = measure(spmv, op_s, v_s, args.iters, jax, jnp)
        print(
            f"{args.devices}-device GSPMD: {gs/1e9:.1f} Gnnz/s "
            f"({gs/g/args.devices*100:.0f}% scaling efficiency)"
        )


if __name__ == "__main__":
    main()
