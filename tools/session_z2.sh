#!/bin/bash
# Session Z2 (round 4): COMPACT_MIN_TRIS calibration — third/fourth
# datapoints between helmet (15K tris, compaction -78%) and dragon
# (100K, compaction +57%): spheres 49.6K (auto=on) and random 14K
# (auto=off), each at both settings, 1080p.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_z2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/spheres.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/spheres.scn TRACY_BENCH_COMPACT=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/random.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/random.scn TRACY_BENCH_COMPACT=262144 timeout 1500 python -u bench.py"
