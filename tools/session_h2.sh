#!/bin/bash
# Session H2 (round 4): FINAL validation at the shipped defaults
# (vlist + w4 + slab_batch + row_skip + defer_uv + mt_point +
#  packet_rays 4096 + compact 262144 + texfetch_batch).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_h2.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "PARITY_SCENES=cornell,furnace,testtree python -u tools/tpu_parity.py" \
 "PARITY_SCENES=spheres,trimesh,bunny python -u tools/tpu_parity.py" \
 "PARITY_SCENES=random,dragon,helmet python -u tools/tpu_parity.py" \
 "python -u tools/tpu_grad_bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn timeout 1500 python -u bench.py"
