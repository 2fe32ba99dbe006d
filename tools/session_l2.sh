#!/bin/bash
# Session L2 (round 4): (a) the REAL bounce-megakernel retest — K2's
# BOUNCE=1 runs silently never engaged it (the binder requires
# rb_mode='fused'; the shipped default is vlist — the JSON now records
# "bounce" so this can't recur); fused==vlist at the shipped config
# (session Y), so exp 1 is the A baseline and exp 2 the megakernel.
# (b) texfetch batch=16 (two extraction rounds) vs 8 on helmet, plus
# an on-chip helmet parity check at 16.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_l2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_RBM=fused timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_RBM=fused TRACY_BENCH_BOUNCE=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_TEXBATCH=16 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_TEXBATCH=8 timeout 1500 python -u bench.py" \
 "PARITY_SCENES=helmet PARITY_TEXBATCH=16 timeout 2400 python -u tools/tpu_parity.py"
