#!/bin/bash
# Session S: (a) pin down the ~170us/packet incoherent-wave mystery,
# (b) validate + A/B the new on-core shading stage at 1080p.
# Mystery matrix (all on the shared wave-2 file):
#   1. minloop+noreadback  — is session G's 66us baseline still reachable?
#      + nofastpath variant (dead-packet wrapper implicated?)
#   2. fused+noreadback    — same body, 24-row scratch+DMA
#   3. vlist+nobody2       — appends kept, phase-2 while removed
#      vlist+noappend      — appends removed, phase 2 kept (empty list)
# The gate itself compiles the shade stage (RenderConfig defaults).
cd /root/repo
exec bash tools/tpu_session.sh logs/r2_session_s.log \
 "ABLATE_LIST='noreadback|noreadback,nofastpath' PROBE_RBM=minloop python -u tools/tpu_ablate.py" \
 "ABLATE_LIST='noreadback' PROBE_RBM=fused python -u tools/tpu_ablate.py" \
 "ABLATE_LIST='nobody2|noappend|noappend,nobody2' PROBE_RBM=vlist python -u tools/tpu_ablate.py" \
 "PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=1 python -u tools/tpu_probe_r2.py" \
 "PROBE_SKIP_AB=1 PROBE_W=1920 PROBE_H=1088 PROBE_LEAF=128 PROBE_FRAME_RBM=fused PROBE_FRAME_COMPACT=262144 PROBE_FRAME_SHADE=0 python -u tools/tpu_probe_r2.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=262144 python bench.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=0 python bench.py"
