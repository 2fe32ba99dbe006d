#!/bin/bash
# Session S (round 3): validate the round-2 feature queue on hardware and
# bisect the real per-packet dominator.
#
# Context: sessions F/G's ablation "baselines" (noreadback 66, nomt 28,
# nodma 26) were measured on DEAD waves: pre-16f4aa2, each ablated
# subprocess regenerated wave-2 rays THROUGH the ablated kernel (garbage
# attrs -> zero attenuation -> RR killed every lane; session G's log shows
# "live fraction: 0.000"). With the shared rays file the real numbers are
# minloop 237 / fused 236.6 / noreadback 232 / nomt 170 — the readback
# was never the dominator; ~170us/packet of traversal+DMA+skeleton is.
#
# ORDER = round-3 value density (the tunnel has been flaky; if it dies
# mid-session the most important results must already be logged):
#   1. headline bench on the last-measured-best config (a real number
#      for BASELINE.md / bench defaults, hot compile cache from the gate);
#   2. candidate-default feature benches (woopbf16, vlist+bf16, 4wide,
#      shade, bounce, pipe) — these decide the round-3 defaults;
#   3. the leaf-visit ablation bisection + probes (informs round 4);
#   4. helmet (textured fast path), production parity, grad bench.
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_s.log \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_SKIP1=0 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_WOOPBF16=1 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 TRACY_BENCH_WOOPBF16=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_SHADE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_WOOPBF16=1 TRACY_BENCH_BVHW=4 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_PIPE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BOUNCE=1 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BOUNCE=1 TRACY_BENCH_PIPE=1 python bench.py" \
 "ABLATE_LIST='|nodma|noinit,noout|notrav|noleaf|nomt,nodma' PROBE_RBM=fused python -u tools/tpu_ablate.py" \
 "PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=1 python -u tools/tpu_probe_r2.py" \
 "PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=0 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=0 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 python bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_METRIC=helmet_1080p_4spp_mrays_per_s_per_chip python bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_SHADE=1 TRACY_BENCH_METRIC=helmet_1080p_4spp_shade_mrays_per_s_per_chip python bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 TRACY_BENCH_WOOPBF16=1 TRACY_BENCH_METRIC=helmet_1080p_4spp_vlistbf16_mrays_per_s_per_chip python bench.py" \
 "python -u tools/tpu_parity.py" \
 "python -u tools/tpu_grad_bench.py"
