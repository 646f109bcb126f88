#!/bin/bash
# Round-5 TPU measurement sequence (one chip, runs sequential).
# VERDICT r4 tasks: #1 (50k eight + ellipse refresh), #2 (GT-init floor),
# #3 (LM retry validation on the stress route), #4 (replay < 30 s),
# #10 (drop-free cap A/B).
set -u
cd /root/repo
mkdir -p benchmarks/logs_r05
R=benchmarks
L=benchmarks/logs_r05

echo "=== 1/5 8k eight (LM-retry smoke + drop A/B shipped side) $(date) ==="
BENCH_SCALED_SCANS=8000 BENCH_SCALED_POINTS=8192 BENCH_SCALED_TRAJ=eight \
  timeout 2700 python benchmarks/bench_scaled.py \
  > $R/results_scaled8k_eight_r05.json 2> $L/eight8k.log
echo "rc=$? 8k eight done $(date)"

echo "=== 2/5 50k eight (named-scale stress route) $(date) ==="
BENCH_SCALED_SCANS=50000 BENCH_SCALED_POINTS=8192 BENCH_SCALED_TRAJ=eight \
  BENCH_SCALED_DUMP_GRAPH=$R/graph50k_eight_r05.npz \
  timeout 7800 python benchmarks/bench_scaled.py \
  > $R/results_scaled50k_eight_r05.json 2> $L/eight50k.log
echo "rc=$? 50k eight done $(date)"

echo "=== 3/5 50k ellipse refresh + graph dump $(date) ==="
BENCH_SCALED_SCANS=50000 BENCH_SCALED_POINTS=8192 \
  BENCH_SCALED_DUMP_GRAPH=$R/graph50k_r05.npz \
  timeout 6600 python benchmarks/bench_scaled.py \
  > $R/results_scaled50k_r05.json 2> $L/ellipse50k.log
echo "rc=$? 50k ellipse done $(date)"

echo "=== 4/5 GT-init information-floor check $(date) ==="
timeout 1800 python benchmarks/gt_init_ba.py $R/graph50k_r05.npz 15 \
  > $R/gt_init_ba_r05.json 2> $L/gtinit.log
echo "rc=$? gt-init done $(date)"

echo "=== 5/5 8k eight drop-free caps (A/B other side) $(date) ==="
BENCH_SCALED_SCANS=8000 BENCH_SCALED_POINTS=8192 BENCH_SCALED_TRAJ=eight \
  BENCH_SCALED_CELL_CAP=128 BENCH_SCALED_QCELLS=16384 \
  timeout 3300 python benchmarks/bench_scaled.py \
  > $R/results_scaled8k_eight_dropfree_r05.json 2> $L/eight8k_dropfree.log
echo "rc=$? dropfree done $(date)"

echo "ALL DONE $(date)"
