#!/bin/bash
# r5 flagship campaign v4: budgeted-leg march + finalize.
# The tunneled worker's death window shrank to ~4-5 min under churn, so
# each march attempt advances ONE 32-step leg, saves incrementally, and
# exits cleanly; cool-downs let the remote worker recover. Once the cache
# reaches k>=385, finalize attempts run the evaluation + device-final
# assembly/cross-check (no stepping).
OUT=/root/repo/tensorkrylov_tpu/experiments/data/northstar_d10_n131072_tpu.json
LOG=/root/repo/benchmarks/logs/flagship_r5.log
CACHE=/tmp/tk_ns_state_df64_n131072_m2048_k512.npz
export PYTHONPATH=/root/repo:/root/.axon_site
export TK_DF64_PROJ_CHUNK=512
cd /root/repo

cache_k () { python - <<'PY'
import numpy as np
try:
    print(int(np.load("/tmp/tk_ns_state_df64_n131072_m2048_k512.npz")["k_prev"]))
except Exception:
    print(0)
PY
}

for i in $(seq 1 40); do
  K=$(cache_k)
  if [ "$K" -ge 385 ]; then
    echo "=== v4 finalize attempt $i (cache k_prev=$K) $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 1800 python -m tensorkrylov_tpu.experiments.northstar \
      --storage df64 --state-cache auto --final device \
      --m 2048 --kmax 512 --checkpoints 384 448 512 \
      --save-every 16 --advance-budget 16 \
      --out "$OUT" >> "$LOG" 2>&1
    rc=$?
  else
    echo "=== v4 march attempt $i (cache k_prev=$K) $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 900 python -m tensorkrylov_tpu.experiments.northstar \
      --storage df64 --state-cache auto --final device \
      --m 2048 --kmax 512 --checkpoints 384 448 512 \
      --save-every 16 --advance-budget 16 \
      --out /tmp/ns_march_scratch.json >> "$LOG" 2>&1
    rc=$?
  fi
  echo "=== v4 attempt $i exit rc=$rc (cache k_prev=$(cache_k)) $(date -u +%H:%M:%S) ===" >> "$LOG"
  if [ -f "$OUT" ] && python - "$OUT" <<'PY' >> "$LOG" 2>&1
import json, sys
a = json.load(open(sys.argv[1]))
r, rec = a["result"], a["recipe"]
fresh = rec.get("final") == "device" and rec.get("m") == 2048
ok = fresh and r["converged"] and r["certified_bound"] and r["certified_bound"][-1] < 1e-8
print("artifact check: fresh=%s converged=%s bound=%s -> %s" % (
    fresh, r.get("converged"),
    r["certified_bound"][-1] if r["certified_bound"] else None,
    "DONE" if ok else "retry"))
sys.exit(0 if ok else 1)
PY
  then
    echo "FLAGSHIP_DONE" >> "$LOG"; exit 0
  fi
  sleep 180
done
echo "FLAGSHIP_EXHAUSTED" >> "$LOG"; exit 1
