#!/bin/bash
# Session U2 (round 4): op-level frame traces (helmet + dragon) via
# jax.profiler, if the axon plugin supports device tracing — the honest
# helmet shade-stage decomposition (revised round-5 lead #4).
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_u2.log \
 "TRACE_SCENE=helmet TRACE_DIR=/tmp/tracy_xprof_helmet timeout 1800 python -u tools/tpu_trace.py" \
 "TRACE_SCENE=dragon TRACE_DIR=/tmp/tracy_xprof_dragon timeout 1800 python -u tools/tpu_trace.py"
