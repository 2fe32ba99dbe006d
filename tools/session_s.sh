#!/bin/bash
# Session S: pin down the ~170us/packet incoherent-wave mystery.
# The matrix (all on the shared wave-2 file):
#   1. minloop+noreadback  — is session G's 66us baseline still reachable?
#   2. fused+noreadback    — same body, 24-row scratch+DMA
#   3. vlist+nobody2       — appends kept, phase-2 while removed
#   4. vlist+noappend      — appends removed, phase 2 kept (list empty)
#   5. minloop+noreadback+nofastpath — dead-packet wrapper implicated?
# Then benches with the winning mode.
cd /root/repo
exec bash tools/tpu_session.sh logs/r2_session_s.log \
 "ABLATE_LIST='noreadback|noreadback,nofastpath' PROBE_RBM=minloop python -u tools/tpu_ablate.py" \
 "ABLATE_LIST='noreadback' PROBE_RBM=fused python -u tools/tpu_ablate.py" \
 "ABLATE_LIST='nobody2|noappend|noappend,nobody2' PROBE_RBM=vlist python -u tools/tpu_ablate.py" \
 "TRACY_BENCH_RBM=vlist TRACY_BENCH_COMPACT=262144 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=0 python bench.py" \
 "TRACY_BENCH_RBM=fused TRACY_BENCH_COMPACT=1048576 python bench.py"
