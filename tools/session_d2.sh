#!/bin/bash
# Session D2 (round 4): wide-packet ladder top + final-default check.
# Defaults now prays=4096 (9.18 measured in C2).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_d2.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=8192 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_PRAYS=8192 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=8192 TRACY_BENCH_COMPACT=524288 timeout 1500 python -u bench.py" \
 "PARITY_SCENES=cornell,dragon,helmet python -u tools/tpu_parity.py" \
 "python -u tools/tpu_grad_bench.py"
