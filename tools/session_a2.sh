#!/bin/bash
# Session A2 (round 4): next-lever measurements after row_skip landed.
#   1. mtnotr ablation — sizes the 12 per-visit Woop column relayouts.
#   2. point-form MT wave-2 timing + headline bench (with defer_uv).
#   3. operating-point re-sweeps at 8.4 MRays/s: packet_rays 2048,
#      pps 4, compact 131072/524288.
#   4. helmet texel-page DMA volume (SoL denominator).
#   5. VMEM node-table ceiling bracket: leaf32/leaf16 (leaf8 500'd).
cd /root/repo
P="PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz"
exec bash tools/tpu_session.sh logs/r4_session_a2.log \
 "$P ABLATE_LIST='|mtnotr|nomt' PROBE_DUV=1 python -u tools/tpu_ablate.py" \
 "$P PROBE_MTPOINT=1 PROBE_DUV=1 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_MTPOINT=1 TRACY_BENCH_DEFERUV=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 TRACY_BENCH_PRAYS=2048 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 TRACY_BENCH_PPS=4 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 TRACY_BENCH_COMPACT=131072 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 TRACY_BENCH_COMPACT=524288 timeout 1500 python -u bench.py" \
 "CP_SCENE=helmet PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_countpages.py" \
 "BIG_LEAVES=32,16 python -u tools/tpu_bigscene.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_DEFERUV=1 timeout 1500 python -u bench.py"
