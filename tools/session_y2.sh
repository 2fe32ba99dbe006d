#!/bin/bash
# Session Y2 (round 4): ship-config validation — block_skip default ON +
# compaction auto (tri-count heuristic). Gate, then dragon/helmet/bunny
# at pure defaults, then the driver-style orchestrated bench.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_y2.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn timeout 1500 python -u bench.py" \
 "timeout 1800 python -u bench.py"
