#!/bin/bash
# r5 flagship campaign v2: certified <=1e-8 at d=10, n=131072 ON the v5e.
# v2 changes: TK_DF64_PROJ_CHUNK=512 (4x fewer, better-shaped projection
# GEMMs per step — the serial 16-chunk fori dominated the 1.63 s step) and
# paced syncs every 2 segments (shallow dispatch queue + idle gaps against
# the ~7-16 min continuous-activity worker death window).
OUT=/root/repo/tensorkrylov_tpu/experiments/data/northstar_d10_n131072_tpu.json
LOG=/root/repo/benchmarks/logs/flagship_r5.log
export PYTHONPATH=/root/repo:/root/.axon_site
export TK_DF64_PROJ_CHUNK=512
export TK_DF64_PAUSE_EVERY=0
export TK_DF64_PAUSE_S=15
cd /root/repo
for i in $(seq 1 20); do
  echo "=== v3 attempt $i $(date -u +%H:%M:%S) proj_chunk=$TK_DF64_PROJ_CHUNK ===" >> "$LOG"
  timeout 2400 python -m tensorkrylov_tpu.experiments.northstar \
    --storage df64 --state-cache auto --final device \
    --m 2048 --kmax 512 --checkpoints 384 448 512 --save-every 32 \
    --out "$OUT" >> "$LOG" 2>&1
  rc=$?
  echo "=== v3 attempt $i exit rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  if [ -f "$OUT" ] && python - "$OUT" <<'PY' >> "$LOG" 2>&1
import json, sys
a = json.load(open(sys.argv[1]))
r, rec = a["result"], a["recipe"]
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
  sleep 240
done
echo "FLAGSHIP_EXHAUSTED" >> "$LOG"; exit 1
