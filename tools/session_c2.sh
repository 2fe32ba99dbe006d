#!/bin/bash
# Session C2 (round 4): FINAL-DEFAULTS validation.
# New config defaults: vlist + width4 + slab_batch + row_skip + defer_uv
# + packet_rays 2048 + compact 262144.
#   1-2. headline + helmet at pure defaults.
#   3.   prays4096 retry (sub=32 mask overflow fixed) + pps4 combo.
#   4-6. parity 9/9 at the final defaults.
#   7.   train-step headline (GRAD defaults).
#   8.   kernel-truth visit counts at the final build (SoL denominators).
#   9.   bigscene confound probe: leaf32 720p WITHOUT compaction.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_c2.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PRAYS=4096 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_PPS=4 timeout 1500 python -u bench.py" \
 "PARITY_SCENES=cornell,furnace,testtree python -u tools/tpu_parity.py" \
 "PARITY_SCENES=spheres,trimesh,bunny python -u tools/tpu_parity.py" \
 "PARITY_SCENES=random,dragon,helmet python -u tools/tpu_parity.py" \
 "python -u tools/tpu_grad_bench.py" \
 "python -u tools/tpu_countvisits.py" \
 "BIG_LEAVES=32 BIG_COMPACT=0 python -u tools/tpu_bigscene.py"
