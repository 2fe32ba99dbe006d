#!/bin/bash
# Session T (round 3): combine session S's winners and settle the defaults.
#
# Session S singles (dragon 1080p 4spp, logs/r3_session_s.log):
#   fused baseline 4.581 | +4wide 4.890 | +shade 4.668 | pipe 4.446 |
#   bounce 4.092 | woopbf16 3.942 (regression) | vlist+bf16 3.984.
# So: 4wide and shade are independent wins; bf16/pipe/bounce lose. T benches
# the winning combination, re-checks the compact-group optimum at the new
# operating point, and gives helmet (textured shade path) the best config.
# The gate (run automatically first) now also cross-validates the FIXED
# shade stage + bounce megakernel on real Mosaic (c7b6dd1).
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_t.log \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=65536 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=1048576 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PPS=4 python bench.py" \
 "PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_BVHW=4 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=1 python -u tools/tpu_probe_r2.py" \
 "ABLATE_LIST='|nodma|notrav|noleaf|nomt,nodma' PROBE_RBM=fused PROBE_BVHW=4 python -u tools/tpu_ablate.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_METRIC=helmet_1080p_4spp_best_mrays_per_s_per_chip python bench.py" \
 "PROBE_SCENE=helmet PROBE_SKIP_AB=1 PROBE_D0=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=1 python -u tools/tpu_probe_r2.py" \
 "PROBE_SCENE=helmet PROBE_SKIP_AB=1 PROBE_D0=0 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=0 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/bunny.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_METRIC=bunny_1080p_4spp_best_mrays_per_s_per_chip python bench.py" \
 "TRACY_GRAD_BVHW=4 python -u tools/tpu_grad_bench.py"
