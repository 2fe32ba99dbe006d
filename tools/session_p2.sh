#!/bin/bash
# Session P2 (round 4): (a) scoped-vmem limit via per-jit compiler_options
# (the XLA_FLAGS route FATALs in the CPU client parser, session N2) —
# re-run the previously-500ing big-scene shapes with TRACY_SCOPED_VMEM_KIB;
# (b) stub-kernel probe: emptybody(N2: 76.7/24.5 us/packet at 4096/1024)
# minus stub = TRUE grid machinery vs per-wave XLA packing glue — sizes
# the dead-dispatch elimination lever.
cd /root/repo
exec bash tools/tpu_session.sh logs/r4_session_p2.log \
 "TRACY_SCOPED_VMEM_KIB=65536 BIG_LEAVES=32,16,8 BIG_W=1280 BIG_H=720 BIG_VMEM=8388608 timeout 2400 python -u tools/tpu_bigscene.py" \
 "PROBE_STUB=1 PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz PROBE_PRAYS=4096 ABLATE_LIST='' timeout 1800 python -u tools/tpu_ablate.py" \
 "PROBE_STUB=1 PROBE_LEAF=128 PROBE_PPS=2 PROBE_SKIP_C=1 PROBE_SKIP_D=1 PROBE_RBM=vlist PROBE_BVHW=4 PROBE_SLABB=1 PROBE_RSKIP=1 PROBE_DUV=1 PROBE_MTPOINT=1 PROBE_RAYS_FILE=/tmp/tracy_probe_wave2.npz PROBE_PRAYS=1024 ABLATE_LIST='' timeout 1800 python -u tools/tpu_ablate.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_TEXBATCH=32 timeout 1500 python -u bench.py" \
 "TRACY_BENCH_ORCHESTRATE=0 TRACY_BENCH_SCENE=/root/reference/data/scenes/helmet.scn TRACY_BENCH_SHADE=0 timeout 1500 python -u bench.py"
