#!/bin/bash
# Session X (round 3): size the MT row-loop's internal cost shares with
# timing-only ablations (results wrong by design), at the production config
# (vlist, w4, slab_batch). Decides round 4's MT lever:
#   mtnouv       -> ceiling of deferring winner-u/v extraction to phase 2
#   mtnouv,mtnowin -> + winner-index extraction
#   mtnoxy       -> the x/y Woop transform chains (the MXU-able part)
#   nomt         -> the whole row loop (reference point)
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_x.log \
 "ABLATE_LIST='|mtnouv|mtnouv,mtnowin|mtnoxy|mtnoxy,mtnouv,mtnowin|nomt' PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 python -u tools/tpu_ablate.py"
