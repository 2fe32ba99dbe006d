#!/bin/bash
# Session M2 (round 4): MXU MT transform (mt_mxu) on-chip. The gate's two
# new variants (mtmxu-high/default) validate numerics on cornell before
# any bench. Then dragon A/Bs: control, high (bf16x3), default (1-pass
# bf16), highest (bf16x6); bunny high (traversal-heavy second datapoint).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_m2.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTMXU=high timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTMXU=default timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTMXU=highest timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn TRACY_BENCH_MTMXU=high timeout 1500 python -u bench.py"
