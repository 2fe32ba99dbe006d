#!/bin/bash
# Session B3 (round 4, final): refresh the production renders at the
# final shipped config (scene-adaptive compaction + block_skip +
# texbatch 16) and leave a last driver-style orchestrated bench in the
# log. Helmet's pixels can differ statistically from the old render
# (compaction changes visit order on knife-edge ties) — parity-bounded.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_b3.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_FRAMES=16 TRACY_BENCH_SPP=4 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_IMAGE=/root/repo/renders/helmet_1080p_tpu.png timeout 1800 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_FRAMES=16 TRACY_BENCH_SPP=4 TRACY_BENCH_IMAGE=/root/repo/renders/dragon_1080p_tpu.png timeout 1800 python -u bench.py" \
 "timeout 1800 python -u bench.py"
