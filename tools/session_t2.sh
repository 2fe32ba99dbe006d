#!/bin/bash
# Session T2 (round 4): compact-group re-sweep at the 4096-ray operating
# point (the 131072/262144/524288 sweep was measured pre-row-skip at
# 1024-ray packets; bigger packets may prefer bigger groups).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_t2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=524288 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=1048576 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=131072 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_COMPACT=524288 timeout 1500 python -u bench.py"
