#!/bin/bash
# Session W2 (round 4): validate the compaction auto-heuristic
# (pick_compact_group with num_tris; session V2's regime split) —
# helmet/dragon/bunny benches at the AUTO default, then full 9-scene
# on-chip parity (several golden scenes flip to compact=0).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_w2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn timeout 1500 python -u bench.py" \
 "timeout 2400 python -u tools/tpu_parity.py"
