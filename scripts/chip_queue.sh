#!/bin/bash
# r5 chip queue: runs the remaining at-scale TPU artifacts once the
# flagship campaign finishes (FLAGSHIP_DONE/EXHAUSTED in its log), each
# under timeout with retries (tunneled worker dies at ~7-11 min of
# activity; persistent compile cache makes retries warm).
LOG=/root/repo/benchmarks/logs/chip_queue_r5.log
FLAG=/root/repo/benchmarks/logs/flagship_r5.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "FLAGSHIP_DONE\|FLAGSHIP_EXHAUSTED" "$FLAG"; do sleep 60; done
echo "=== chip queue start $(date -u +%H:%M:%S) ===" >> "$LOG"

run_retry () {  # name, tries, cmd...
  name=$1; tries=$2; shift 2
  for i in $(seq 1 "$tries"); do
    echo "--- $name try $i $(date -u +%H:%M:%S) ---" >> "$LOG"
    timeout 1500 "$@" >> "$LOG" 2>&1 && { echo "--- $name OK ---" >> "$LOG"; return 0; }
    echo "--- $name failed rc=$? ---" >> "$LOG"; sleep 30
  done
  return 1
}

# 1) BASELINE config 4 at scale via the recording path (VERDICT #2/#3)
run_retry config4_recorded 4 python -m tensorkrylov_tpu.experiments.config4_block \
  --n 10240 --d 10 --kappa 1e4 --rank 4 --kmax 120 --recorded --final device \
  --skip-multi --out tensorkrylov_tpu/experiments/data/config4_block_d10_n10240_r4.json

# 2) config 4 + deflation (VERDICT #9 at scale): fewer columns via kappa_eff
run_retry config4_deflated 3 python -m tensorkrylov_tpu.experiments.config4_block \
  --n 10240 --d 10 --kappa 1e4 --rank 4 --kmax 120 --recorded --final device \
  --m 512 --skip-multi \
  --out tensorkrylov_tpu/experiments/data/config4_block_d10_n10240_r4_m512.json

# 3) nonsym (ConvDiff) at scale (VERDICT #7)
run_retry nonsym_scale 4 python -m tensorkrylov_tpu.experiments.nonsym_scale \
  --n 16384 --d 10 --kappa 1e4 --kmax 384

# 4) bench re-pin (VERDICT #10 + resident-in-solve evidence)
run_retry bench 3 python bench.py

echo "=== chip queue done $(date -u +%H:%M:%S) ===" >> "$LOG"
