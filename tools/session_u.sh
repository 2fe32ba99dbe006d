#!/bin/bash
# Session U (round 3): wide packets (2048/4096 rays) + the un-413'd textured
# shade stage on helmet + parity at the round-3 default config.
#
# Why wide packets: the trustworthy ablations (sessions S/T) put the cost in
# SERIAL per-visit work (inner traversal 139us@w2 / 85us@w4, MT+DMA ~66-107us
# per 1024-ray packet) while the VPU vector work is nearly free. Per-ray
# visits drop ~3x from 1024 to 4096 rays/packet at wave-2 incoherence
# (tools/traversal_stats.py), so wider packets amortize the serial cost.
# Why helmet again: its textured shade stage never actually ran — the 270MB
# texel pages were closure-captured into the HLO and the remote compile
# service rejected the body (HTTP 413); they now ride as jit arguments.
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_u.log \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PRAYS=2048 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PRAYS=4096 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PRAYS=4096 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PRAYS=2048 python bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_METRIC=helmet_1080p_4spp_shadefix_mrays_per_s_per_chip python bench.py" \
 "TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 TRACY_BENCH_BVHW=4 TRACY_BENCH_SHADE=1 TRACY_BENCH_PRAYS=4096 TRACY_BENCH_METRIC=helmet_1080p_4spp_shadefix_p4096_mrays_per_s_per_chip python bench.py" \
 "PROBE_SCENE=helmet PROBE_SKIP_AB=1 PROBE_D0=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_BVHW=4 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=1 python -u tools/tpu_probe_r2.py" \
 "PROBE_RBM=fused PROBE_BVHW=4 PROBE_PRAYS=4096 PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 python -u tools/tpu_probe_r2.py" \
 "PARITY_BVHW=4 PARITY_SHADE=1 python -u tools/tpu_parity.py"
