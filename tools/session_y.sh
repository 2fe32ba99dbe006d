#!/bin/bash
# Session Y (round 4): measure the row-skip + defer-uv levers.
#   1. gate (auto) — includes the new rowskip/deferuv on-chip variants.
#   2. wave-2/primary probe A/B at the production config (vlist, w4,
#      slab_batch): base vs +rowskip vs +rowskip+deferuv vs +deferuv.
#   3. headline bench at the winning config candidates.
#   4. helmet bench at defaults (rowskip on).
#   5. helmet wave-2 rays + kernel-truth visit counts (SoL model input).
#   6. train-step ablation (fwd/vag/step + bounce sweep).
cd /root/repo
P="PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz"
exec bash tools/tpu_session.sh logs/r4_session_y.log \
 "$P python -u tools/tpu_probe_r2.py" \
 "$P PROBE_RSKIP=1 python -u tools/tpu_probe_r2.py" \
 "$P PROBE_RSKIP=1 PROBE_DUV=1 python -u tools/tpu_probe_r2.py" \
 "$P PROBE_DUV=1 python -u tools/tpu_probe_r2.py" \
 "$P PROBE_RSKIP=1 PROBE_RBM=fused python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_ROWSKIP=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "PROBE_SCENE=helmet PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_probe_r2.py" \
 "CV_SCENE=helmet PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_countvisits.py" \
 "python -u tools/tpu_grad_ablate.py"
