#!/bin/bash
# Round-5 session D: the experiments lost to the mid-session tunnel
# stalls (B/C), in value order, plus the two calibration sweeps.
#   1-2. helmet/bunny two_pop A/B (decides whether the knob flips on
#        anywhere; dragon measured +0.7% in-session B);
#   3. scene-size curve at the default config (VERDICT #5);
#   4. compaction threshold calibration (VERDICT #6).
# Run via tools/tpu_session.sh (gate first, snapshot, logs).
cd /root/repo
nohup bash tools/tpu_session.sh logs/r5_session_d.log \
 "TRACY_BENCH_TWOPOP=1 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn python -u bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn python -u bench.py" \
 "TRACY_BENCH_TWOPOP=1 TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn python -u bench.py" \
 "timeout 2900 python -u tools/tpu_scenesize.py" \
 "timeout 2900 python -u tools/tpu_compactcal.py" \
 "PROBE_SCENE=helmet PROBE_SKIP_AB=1 PROBE_D0=pack PROBE_W=1920 PROBE_H=1088 PROBE_RBM=vlist PROBE_PRAYS=4096 PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_FRAME_COMPACT=0 timeout 2400 python -u tools/tpu_probe_r2.py" \
 > /dev/null 2>&1 &
echo "session D launched (pid $!)"
