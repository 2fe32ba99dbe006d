#!/bin/bash
# Session R2 (round 4): (a) 2M-tri scene at 1080p on the Pallas path with
# the DEFAULT config — exercises the new 6 MB budget + automatic scoped-
# vmem raise end-to-end; (b) the 3-rung frame decomposition re-run at
# 1920x1088 (Q2's 1080 crashed tile_fold: 1080 % 32 != 0); (c) dragon
# control after the auto-raise change (0.7 MB tables: no behavior delta
# expected).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_r2.log \
 "BIG_SPHERES=256 BIG_LEAVES=128 BIG_W=1920 BIG_H=1080 timeout 2400 python -u tools/tpu_bigscene.py" \
 "PROBE_SKIP_AB=1 PROBE_D0=pack PROBE_W=1920 PROBE_H=1088 PROBE_RBM=vlist PROBE_PRAYS=4096 PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_FRAME_COMPACT=262144 timeout 2400 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py"
