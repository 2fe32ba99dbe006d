#!/bin/bash
# Session G2 (round 4): mt_point retest at the 4096-ray final config
# (MT math is again ~49% of wave-2 there; it was neutral at 1024).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_g2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTPOINT=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTPOINT=1 timeout 1500 python -u bench.py" \
 "PARITY_SCENES=cornell,dragon PARITY_MTPOINT=1 python -u tools/tpu_parity.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_MTPOINT=1 timeout 1500 python -u bench.py"
