#!/bin/bash
# Session S2 (round 4): helmet frame probes. The R2-style pack-stub
# decomposition does NOT transfer to helmet (run_stub_frame bypasses the
# Renderer's on-core shade binding, so its stub frame would run the 18x
# XLA texture path). Instead: helmet full frames at pps 2/8 (probe D),
# bench at pps 1, and a dragon pps=1 control — the packets_per_step knob
# gates BOTH the intersect and the texfetch/shade kernels and has never
# been swept at the texbatch-16 operating point.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_s2.log \
 "PROBE_SCENE=helmet PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_RBM=vlist PROBE_PRAYS=4096 PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_FRAME_COMPACT=262144 timeout 2400 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_PPS=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PPS=1 timeout 1500 python -u bench.py"
