"""Scoped SOLVER-LOOP Gnnz/s measurement (VERDICT r3 #2): complete f32
Lanczos steps — SpMV + reductions + axpys + normalize + basis write — via
the VMEM-resident multi-step kernel (ops/pallas/resident_lanczos.py) vs the
XLA step loop. Same two-point-slope method as bench.py's
_bench_solver_loop_resident (this is that measurement, standalone, so the
number can be (re)captured without paying the full bench).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/solver_loop_bench.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import tensorkrylov_tpu as tk
    from tensorkrylov_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import SPMV_D, SPMV_N, _bench_solver_loop_resident

    platform = jax.devices()[0].platform
    loop_xla, loop_res = _bench_solver_loop_resident(tk, jax, jnp)
    print(json.dumps({
        "platform": platform,
        "config": f"d={SPMV_D} tridiag n=2^20 f32, complete Lanczos steps",
        "solver_loop_xla_gnnz_s": round(loop_xla, 1),
        "solver_loop_resident_gnnz_s": round(loop_res, 1),
        "resident_vs_xla": round(loop_res / loop_xla, 2) if loop_xla else None,
    }))


if __name__ == "__main__":
    main()
