#!/bin/bash
# Session B2 (round 4): combine the A2 winners and finalize defaults.
#   1-5. headline combos: prays4096; prays2048 x compact 131072/262144;
#        width8; width8+prays2048 (all with defer_uv = new default).
#   6.   helmet at prays2048.
#   7.   train-step headline at the new defaults (vlist/w4/defer, GRAD_BVHW=4).
#   8.   helmet texel-page counts (fixed: no jit over TexturePages).
#   9-10. bigscene: leaf32 720p retry (flake check); leaf16,8 at 320x240
#        (node-table ceiling bracket).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_b2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=4096 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=2048 TRACY_BENCH_COMPACT=131072 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=2048 TRACY_BENCH_COMPACT=524288 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_BVHW=8 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_BVHW=8 TRACY_BENCH_PRAYS=2048 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_PRAYS=2048 timeout 1500 python -u bench.py" \
 "python -u tools/tpu_grad_bench.py" \
 "CP_SCENE=helmet PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_countpages.py" \
 "BIG_LEAVES=32 python -u tools/tpu_bigscene.py" \
 "BIG_LEAVES=16,8 BIG_W=320 BIG_H=240 BIG_FRAMES=2 python -u tools/tpu_bigscene.py"
