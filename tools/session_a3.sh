#!/bin/bash
# Session A3 (round 4): validate the refined compaction heuristic
# (tri count AND no-translucent; Z2 found random.scn collapses without
# compaction despite 14K tris — BTDF rays survive all bounces).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_a3.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/random.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "PARITY_SCENES=random,helmet timeout 2400 python -u tools/tpu_parity.py"
