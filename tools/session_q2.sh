#!/bin/bash
# Session Q2 (round 4): (a) scoped limit 96M for the leaf16/leaf8 shapes
# (P2: 64M fixed leaf32@720p at 3.15 MRays/s; leaf16 wants 85.09M), plus
# a 1080p big-scene run; (b) THE frame decomposition at production 1080p:
# no-pack stub frame vs pack-stub frame vs full frames — splits XLA
# structure / fused packing glue / kernel body in the REAL fused graph
# (isolated probes mislead: stub 92.3us/packet ~= emptybody 76.7, yet
# helmet's 103ms full frame bounds fused glue far lower); (c) block_skip
# A/B on the dragon headline.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_q2.log \
 "TRACY_SCOPED_VMEM_KIB=98304 BIG_LEAVES=16,8 BIG_W=1280 BIG_H=720 BIG_VMEM=8388608 timeout 2400 python -u tools/tpu_bigscene.py" \
 "TRACY_SCOPED_VMEM_KIB=98304 BIG_LEAVES=32 BIG_W=1920 BIG_H=1080 BIG_VMEM=8388608 timeout 2400 python -u tools/tpu_bigscene.py" \
 "PROBE_SKIP_AB=1 PROBE_D0=pack PROBE_W=1920 PROBE_H=1080 PROBE_RBM=vlist PROBE_PRAYS=4096 PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_FRAME_COMPACT=262144 timeout 2400 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_BLOCKSKIP=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py"
