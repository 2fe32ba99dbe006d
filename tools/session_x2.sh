#!/bin/bash
# Session X2 (round 4): helmet re-trace at the NEW operating point
# (compact auto->0, +block_skip variant) — find the next helmet
# bottleneck now that the butterfly is gone; then flip-check block_skip
# as a default (V2: helmet +2.2%, dragon neutral).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_x2.log \
 "TRACE_SCENE=helmet TRACE_DIR=/tmp/tracy_xprof_helmet0 timeout 1800 python -u tools/tpu_trace.py" \
 "TRACE_SCENE=helmet TRACE_BLOCKSKIP=1 TRACE_DIR=/tmp/tracy_xprof_helmet0b timeout 1800 python -u tools/tpu_trace.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_BLOCKSKIP=1 timeout 1500 python -u bench.py"
