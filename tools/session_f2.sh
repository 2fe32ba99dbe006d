#!/bin/bash
# Session F2 (round 4): find the NEW dominator at the final config
# (vlist + w4 + slab_batch + row_skip + defer_uv + prays4096).
cd /root/repo
P="PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_PRAYS=4096 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz"
exec bash tools/tpu_session.sh logs/r4_session_f2.log \
 "$P ABLATE_LIST='|notrav|noleaf|nomt,nodma|noinit,noout' python -u tools/tpu_ablate.py" \
 "$P PROBE_PRAYS=1024 ABLATE_LIST='|notrav|noleaf|nomt,nodma' python -u tools/tpu_ablate.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_COMPACT=131072 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PPS=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PPS=4 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SHADE=0 timeout 1500 python -u bench.py" \
 "PROBE_SKIP_AB=1 PROBE_SKIP_C=1 PROBE_D0=1 PROBE_SKIP_D=0 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_PRAYS=4096 python -u tools/tpu_probe_r2.py"
