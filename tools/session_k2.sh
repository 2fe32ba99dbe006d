#!/bin/bash
# Session K2 (round 4): bounce-megakernel retest at the shipped config.
# The J2 emptybody probe showed the per-packet plumbing floor is pure
# block-pipeline machinery scaling with BYTES (~20 ns/ray); the
# megakernel removes one full out+in round trip per bounce. It lost at
# the round-3 config (4.09 vs 4.58) — retest with row_skip + 4096.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_k2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_BOUNCE=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_BOUNCE=1 TRACY_BENCH_PRAYS=1024 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py"
