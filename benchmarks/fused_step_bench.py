"""Flagship Lanczos step throughput: XLA step vs fused two-pass Pallas step.

Config matches the BASELINE.md flagship: d=10, n=131072, f32 basis/compute,
f64 projected algebra, plain Lanczos. Steps-only segments (no projected
stage), two-point slope timing, value-fetch sync (see bench.py for why).

Run (TPU): timeout 1200 python benchmarks/fused_step_bench.py
"""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import tensorkrylov_tpu as tk
    from tensorkrylov_tpu.ops.orth import init_state, lanczos_step
    from tensorkrylov_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    d, n, K = 10, 131072, 64
    op = tk.laplace(d, n, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((d, n)), jnp.float32)
    b = b / jnp.linalg.norm(b, axis=1, keepdims=True)

    results = {}
    for fused in (False, True):

        @jax.jit
        def seg(op, b, state, m):
            def body(i, st):
                k = 1 + i % K  # cycle within the padded buffer (throughput only)
                st2, _ = lanczos_step(
                    op, st, b, k, reorth=False, proj_dtype=jnp.float64, fused=fused
                )
                return st2

            return jax.lax.fori_loop(0, m, body, state)

        state0, _ = init_state(op, b, K, jnp.float64, jnp.float32)

        def timed(m):
            mj = jnp.asarray(m, jnp.int32)
            float(jnp.sum(seg(op, b, state0, mj).beta))  # compile + run
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(seg(op, b, state0, mj).beta))
                best = min(best, time.perf_counter() - t0)
            return best

        m1, m2 = 64, 256
        dt1, dt2 = timed(m1), timed(m2)
        if dt2 > 1.2 * dt1:
            per_step = (dt2 - dt1) / (m2 - m1)
        else:
            per_step = dt2 / m2
        name = "fused" if fused else "xla"
        results[name] = per_step
        print(f"{name}: {per_step*1e3:.3f} ms/step  ({1.0/per_step:.1f} steps/s)", flush=True)

    if "xla" in results and "fused" in results:
        print(f"speedup: {results['xla']/results['fused']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
