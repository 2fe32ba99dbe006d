#!/bin/bash
# Session O2 (round 4): helmet stage bisection at the new texbatch-16
# default. Exps: texbatch 32 (4 extraction rounds), shade stage OFF
# (XLA shading control — isolates the on-core shade+fetch stage's
# contribution at the current operating point), texfetch pps 4
# (shade-stage packets_per_step interplay), and a dragon control re-run.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_o2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_TEXBATCH=32 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_SHADE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_PPS=4 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py"
