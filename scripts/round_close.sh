#!/usr/bin/env bash
# End-of-round close checklist (round-10, verdict item 1: the round-9
# close ran gates/sweeps/soak but NOT the pytest suite, which let a
# stale plan pin slip). Run every step before the end-of-round commit;
# every artifact lands in the repo root as *_r${R}*.json.
#
# Usage: bash scripts/round_close.sh <round-number>
set -euo pipefail
R="${1:?usage: round_close.sh <round-number>}"
cd "$(dirname "$0")/.."

echo "== [1/7] full pytest suite (serial) =="
python -m pytest tests/ -q 2>&1 | tail -3

echo "== [2/7] full-registry driver gate @ sf0.01 =="
python scripts/driver_gate.py /root/testdata/sf0.01 \
  --out="CORRECTNESS_LOCAL_r${R}.json" | tail -2

echo "== [3/7] full-registry driver gate @ sf0.1 =="
python scripts/driver_gate.py /root/testdata/sf0.1 \
  --out="CORRECTNESS_LOCAL_r${R}_sf01.json" | tail -2

echo "== [4/7] adversarial sweeps (hot-key + null-time + extremes + vec-skew) =="
python scripts/adversarial_sweep.py geoskew  --out="ROBUSTNESS_r${R}_geoskew.json"  | tail -1
python scripts/adversarial_sweep.py nullts   --out="ROBUSTNESS_r${R}_nullts.json"   | tail -1
python scripts/adversarial_sweep.py extremes --out="ROBUSTNESS_r${R}_extremes.json" | tail -1
python scripts/adversarial_sweep.py vecskew  --out="ROBUSTNESS_r${R}_vecskew.json"  | tail -1

echo "== [5/7] oracle stability =="
python scripts/oracle_stability.py --out="ORACLE_STABILITY_r${R}.json" | tail -2

echo "== [6/7] leak probe (full registry, retained-block staircase) =="
python scripts/leak_probe.py --out="LEAK_PROBE_r${R}.json" | tail -2

echo "== [7/7] 6-thread concurrency soak =="
python scripts/soak_threads.py --out="SOAK_THREADS_r${R}.json" | tail -2

echo "== bench (informational; the driver runs its own) =="
python bench.py 2>/dev/null | tail -1

echo "round-${R} close sequence complete"
