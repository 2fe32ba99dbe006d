#!/bin/bash
# Session Z (round 4): consolidate the row-skip round.
#   1-3. headline A/B: default(rowskip) vs rowskip+deferuv vs rowskip-off,
#        then helmet at defaults (re-runs of session Y's raced exps 7-9).
#   4-5. helmet wave-2 rays (fixed 413-safe probe) + kernel-truth visit
#        counts -> the helmet speed-of-light model.
#   6-7. train-step headline + fixed (hoist-proof) bisection after the
#        production-config rewire.
#   8.   520K-tri big-scene Pallas-path proof (+ leaf8 VMEM stress).
#   9-11. production-config parity for ALL 9 reference scenes on chip.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_z.log \
 "TRACY_BENCH_ORCHESTRATE=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_DEFERUV=1 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_ROWSKIP=0 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn timeout 1500 python -u bench.py" \
 "PROBE_SCENE=helmet PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_probe_r2.py" \
 "CV_SCENE=helmet PROBE_RAYS_FILE=/tmp/tracy_helmet_wave2.npz python -u tools/tpu_countvisits.py" \
 "python -u tools/tpu_grad_bench.py" \
 "python -u tools/tpu_grad_ablate.py" \
 "python -u tools/tpu_bigscene.py" \
 "PARITY_SCENES=cornell,furnace,testtree python -u tools/tpu_parity.py" \
 "PARITY_SCENES=spheres,trimesh,bunny python -u tools/tpu_parity.py" \
 "PARITY_SCENES=random,dragon,helmet python -u tools/tpu_parity.py"
