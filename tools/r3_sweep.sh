#!/bin/bash
# Round-3 TPU measurement sweep — run when the axon tunnel is live.
# Usage: bash tools/r3_sweep.sh [logfile]
# Measures, in order of decision value:
#   1. part O   — (R,D)/(R,8) vs (D,R)/(8,R) layout microbench
#   2. part B   — walk baselines with the new defaults (ladder + presplit)
#   3. part B with PTRT_MT_CM=1 / PTRT_STACK_CM=1 (in-situ layout effect)
#   4. part L   — in-situ frame ladder (scattered walks are 81% of d4)
#   5. bench.py — headline Mrays/s
set -u
LOG=${1:-/tmp/r3_sweep.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-1800}" env "$@" 2>&1 | grep -v -E "^E08|Warning" | tee -a "$LOG"
}

date | tee -a "$LOG"
run PARTS=o SUB=m python -u tools/prof_r3.py
run PARTS=o SUB=s python -u tools/prof_r3.py
run PARTS=b python -u tools/prof_r3.py
run PARTS=b PTRT_MT_CM=1 python -u tools/prof_r3.py
run PARTS=b PTRT_STACK_CM=1 python -u tools/prof_r3.py
run PARTS=b PTRT_NODE_CM=1 python -u tools/prof_r3.py
run PARTS=b PTRT_MT_CM=1 PTRT_STACK_CM=1 PTRT_NODE_CM=1 python -u tools/prof_r3.py
run PARTS=q python -u tools/prof_r3.py
run PARTS=q PTRT_MT_CM=1 PTRT_STACK_CM=1 PTRT_NODE_CM=1 python -u tools/prof_r3.py
run PARTS=q PTRT_LEAF_EVERY=2 python -u tools/prof_r3.py
run PARTS=b PTRT_LEAF_EVERY=2 python -u tools/prof_r3.py
T=3600 run PARTS=l python -u tools/prof_r3.py
T=3600 run python bench.py
date | tee -a "$LOG"
