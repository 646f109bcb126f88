#!/bin/bash
# Round-5 post-sequence TPU measurements: LC stage walls (VERDICT #6),
# refreshed fused-step trace (VERDICT #7), paired features-row ATE
# (VERDICT #8), final headline bench with the fair baseline (VERDICT #5).
set -u
cd /root/repo
L=benchmarks/logs_r05

echo "=== b0 profile_replay at realistic keyframe size (dedup A/B) $(date) ==="
PROF_REPLAY_PTS=8192 PROF_REPLAY_KF=512 timeout 1200 \
  python tools/profile_replay.py > $L/replay_r05.txt 2>&1
echo "rc=$? replay profile done $(date)"

echo "=== b1 bench_suite lc (stage-wall attribution) $(date) ==="
timeout 1500 python benchmarks/bench_suite.py lc \
  > benchmarks/results_lc_r05.json 2> $L/suite_lc.log
echo "rc=$? lc row done $(date)"

echo "=== b2 profile_trace (refreshed device-time budget) $(date) ==="
timeout 1200 python tools/profile_trace.py > $L/trace_r05.txt 2>&1
echo "rc=$? trace done $(date)"

echo "=== b3 bench_suite full+features (headline + paired ATE) $(date) ==="
timeout 1800 python benchmarks/bench_suite.py full features \
  > benchmarks/results_full_features_r05.json 2> $L/suite_ff.log
echo "rc=$? full+features done $(date)"

echo "=== b4 final bench.py (fair baseline headline) $(date) ==="
timeout 1500 python bench.py > $L/bench_final.json 2> $L/bench_final.log
echo "rc=$? bench.py done $(date)"

echo "ALL R05B DONE $(date)"
