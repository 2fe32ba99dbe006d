#!/bin/bash
# Session J2 (round 4): decompose the per-packet plumbing floor
# (~24 us/1024-eq at the shipped config; ~75% of the primary wave).
cd /root/repo
P="PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz"
exec bash tools/tpu_session.sh logs/r4_session_j2.log \
 "$P PROBE_PRAYS=4096 ABLATE_LIST='emptybody|notrav|notrav,noinit,noout|notrav,nofastpath' python -u tools/tpu_ablate.py" \
 "$P PROBE_PRAYS=1024 ABLATE_LIST='emptybody|notrav|notrav,noinit,noout' python -u tools/tpu_ablate.py" \
 "$P PROBE_PRAYS=4096 PROBE_PPS=8 ABLATE_LIST='emptybody|notrav' python -u tools/tpu_ablate.py"
