#!/bin/bash
# Session W (round 3): batched slab reductions (pallas_slab_batch) — one
# fused vector->scalar drain per inner visit instead of one per child.
# Session V denominators: inner 54 visits x ~1.6us at w4 wave2 (85us of
# 220); if the per-child drains dominate that 1.6us, this recovers most.
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_w.log \
 "TRACY_BENCH_SLABB=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_SLABB=1 python bench.py" \
 "ABLATE_LIST='|noleaf|nomt' PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 python -u tools/tpu_ablate.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_SLABB=1 TRACY_BENCH_METRIC=helmet_1080p_4spp_slabb_mrays_per_s_per_chip python bench.py"
