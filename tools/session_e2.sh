#!/bin/bash
# Session E2 (round 4): batched texel-page fetch A/B on helmet + sanity.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_e2.log \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_TEXBATCH=0 timeout 1500 python -u bench.py" \
 "PARITY_SCENES=helmet python -u tools/tpu_parity.py" \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py"
