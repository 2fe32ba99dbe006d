#!/bin/bash
# Session V2 (round 4): compaction on/off/size on HELMET (the U2 trace
# shows the butterfly = 22.5% and XLA data movement 26.9% of its frame;
# all pallas kernels only ~30% — compaction was only ever swept on
# dragon). Plus dragon compact=0 control at the current operating point.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_v2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_COMPACT=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_COMPACT=65536 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_COMPACT=0 TRACY_BENCH_BLOCKSKIP=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=0 TRACY_BENCH_BLOCKSKIP=1 timeout 1500 python -u bench.py"
