"""Compiler-schedule evidence for the ring-halo SpMV's comm/compute overlap
(VERDICT r3 #7).

A hardware ICI trace needs >= 2 physical chips (not available: one v5e
behind a tunnel), so this captures the next-strongest artifact: the
OPTIMIZED, SCHEDULED HLO of parallel/halo.py:spmv_halo_local compiled AOT
for a REAL v5e:2x4 TPU topology (jax.experimental.topologies — XLA:TPU
compiles for a declared topology without the hardware), and verifies:

  1. the compiler split every ppermute into async collective-permute-
     start/done pairs (the overlappable form), and
  2. the linear schedule places the interior stencil fusions BETWEEN the
     starts and the dones — on a real slice those fusions execute while
     the ICI transfer is in flight, which IS the overlap.

Measured result (committed in benchmarks/data/ring_overlap_evidence.json):
4 starts -> 9 interior fusions -> 4 dones -> edge-correction fusions.

Run: python benchmarks/ring_overlap_evidence.py   (TPU plugin available)
     (falls back to reporting non-applicability on CPU-only hosts: the
      CPU backend never splits collectives into async pairs)
"""
from __future__ import annotations

import json
import os
import re


def _schedule_events(txt: str):
    m = re.search(r"ENTRY [^\{]+\{(.*?)\n\}", txt, re.S)
    events = []
    for ln in m.group(1).splitlines():
        s = ln.strip()
        if not s or "=" not in s:
            continue
        name = s.split("=")[0].strip().lstrip("%")
        if "collective-permute-start(" in s:
            kind = "CP-START"
        elif "collective-permute-done(" in s:
            kind = "CP-DONE"
        elif " fusion(" in s:
            kind = "fusion"
        else:
            continue
        events.append((name, kind))
    return events


def main():
    import numpy as np
    import jax

    jax.config.update("jax_enable_x64", True)
    from jax.sharding import Mesh, PartitionSpec as P

    import tensorkrylov_tpu as tk
    from tensorkrylov_tpu.parallel.halo import spmv_halo_local

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4")
        devices = np.array(topo.devices).reshape(-1)
        mesh_kind = "AOT v5e:2x4 topology (8 chips)"
    except Exception as e:  # CPU-only host: no TPU compiler available
        print("TPU topology unavailable:", e)
        out = {"overlap_scheduled": None,
               "note": "needs the TPU compiler (AOT topology); the CPU "
                       "backend never splits collectives into async pairs"}
        _save(out)
        return

    mesh = Mesh(devices, ("mode",))
    d, n = 4, 65536
    op = tk.laplace(d, n)
    f = jax.jit(
        jax.shard_map(
            lambda bands, vv: spmv_halo_local(bands, op.offsets, vv, "mode"),
            mesh=mesh,
            in_specs=(P(None, None, "mode"), P(None, "mode")),
            out_specs=P(None, "mode"),
        )
    )
    txt = f.lower(
        jax.ShapeDtypeStruct(op.bands.shape, np.float64),
        jax.ShapeDtypeStruct((d, n), np.float64),
    ).compile().as_text()

    ev = _schedule_events(txt)
    kinds = [k for _, k in ev]
    starts = [i for i, k in enumerate(kinds) if k == "CP-START"]
    dones = [i for i, k in enumerate(kinds) if k == "CP-DONE"]
    fus = [i for i, k in enumerate(kinds) if k == "fusion"]
    hidden = [i for i in fus if starts and dones
              and starts[0] < i < max(dones)]
    out = {
        "mesh": mesh_kind,
        "problem": f"laplace d={d}, n={n}, f64, mode-sharded ring",
        "collective_permute_async_split": bool(starts and dones),
        "n_starts": len(starts),
        "n_dones": len(dones),
        "interior_fusions_scheduled_under_exchange": len(hidden),
        "overlap_scheduled": bool(hidden),
        "schedule": [f"{k} {nme}" for nme, k in ev],
        "note": ("optimized+scheduled XLA:TPU HLO; the fusions between "
                 "-start and -done execute while the ICI transfer is in "
                 "flight on a real slice. Hardware trace requires >= 2 "
                 "chips (unavailable: 1 tunneled v5e)."),
    }
    _save(out)
    print(json.dumps({k: v for k, v in out.items() if k != "schedule"},
                     indent=1))
    print("\nschedule:")
    for i, (nme, k) in enumerate(ev):
        tag = " <== hidden under exchange" if i in hidden else ""
        print(f"  {i:3d} {k:9s} {nme[:56]}{tag}")


def _save(out):
    path = os.path.join(os.path.dirname(__file__), "data",
                        "ring_overlap_evidence.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fjs:
        json.dump(out, fjs, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
