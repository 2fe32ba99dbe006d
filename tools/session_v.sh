#!/bin/bash
# Session V (round 3): exact kernel visit counts (the denominators for all
# per-visit cost models) + clean MT-vs-DMA splits at the production config
# (w4, leaf128). Informs the round-4 leaf-side lever (MXU-MT vs pop-culling).
cd /root/repo
exec bash tools/tpu_session.sh logs/r3_session_v.log \
 "CV_BVHW=4 python -u tools/tpu_countvisits.py" \
 "CV_BVHW=2 python -u tools/tpu_countvisits.py" \
 "ABLATE_LIST='|nomt|dma16|nomt,dma16' PROBE_RBM=fused PROBE_BVHW=4 python -u tools/tpu_ablate.py" \
 "ABLATE_LIST='|nomt|noappend' PROBE_RBM=vlist PROBE_BVHW=4 python -u tools/tpu_ablate.py"
