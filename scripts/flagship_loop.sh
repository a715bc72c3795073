#!/bin/bash
# r5 flagship campaign: certified <=1e-8 at d=10, n=131072 ON the v5e
# (VERDICT r4 #1). Each attempt resumes from the k=64 df64 state cache
# (resume-only; pulls are ~1.6 MB/s on this tunnel) and finalizes fully on
# device. The tunneled worker dies stochastically at ~7-16 min of activity
# (r4/r5 measured) => retry until one attempt survives end-to-end.
OUT=/root/repo/tensorkrylov_tpu/experiments/data/northstar_d10_n131072_tpu.json
LOG=/root/repo/benchmarks/logs/flagship_r5.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for i in $(seq 1 20); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2100 python -m tensorkrylov_tpu.experiments.northstar \
    --storage df64 --state-cache auto --no-state-save --final device \
    --m 2048 --kmax 512 --checkpoints 384 448 512 \
    --out "$OUT" >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $i exit rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  if [ -f "$OUT" ] && python - "$OUT" <<'PY' >> "$LOG" 2>&1
import json, sys
a = json.load(open(sys.argv[1]))
r, rec = a["result"], a["recipe"]
# r5 freshness: only the r5 recipe runs final='device'; r3's stale artifact
# at this path has final absent
fresh = rec.get("final") == "device" and rec.get("m") == 2048
ok = fresh and r["converged"] and r["certified_bound"][-1] < 1e-8
print("artifact check: fresh=%s converged=%s bound=%s -> %s" % (
    fresh, r.get("converged"), r["certified_bound"][-1] if r["certified_bound"] else None,
    "DONE" if ok else "retry"))
sys.exit(0 if ok else 1)
PY
  then
    echo "FLAGSHIP_DONE" >> "$LOG"; exit 0
  fi
  sleep 45
done
echo "FLAGSHIP_EXHAUSTED" >> "$LOG"; exit 1
