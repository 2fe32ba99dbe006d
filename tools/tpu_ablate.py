#!/usr/bin/env python3
"""Kernel cost bisection via TRACY_PALLAS_ABLATE (results wrong; time only).

Must re-import tracy_tpu per ablation -> runs each config as a subprocess.
"""
import os
import subprocess
import sys

PROBE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_probe_r2.py")

DEFAULT = ("", "noreadback", "nomt", "nodma", "noreadback,nomt",
           "noreadback,nomt,nodma", "noleaf")
# Override the config list: ABLATE_LIST="a,b|c|" (|-separated configs).
configs = (os.environ["ABLATE_LIST"].split("|")
           if "ABLATE_LIST" in os.environ else DEFAULT)

# All configs probe IDENTICAL wave-2 rays (generated once, unablated).
rays_file = os.environ.get("PROBE_RAYS_FILE", "/tmp/tracy_probe_wave2.npz")

for ab in configs:
    env = dict(os.environ, TRACY_PALLAS_ABLATE=ab, PROBE_LEAF="128",
               PROBE_PPS="2", PROBE_SKIP_C="1", PROBE_SKIP_D="1",
               PROBE_RAYS_FILE=rays_file)
    print(f"=== ablate [{ab or 'none'}] ===", flush=True)
    r = subprocess.run([sys.executable, "-u", PROBE], env=env,
                       capture_output=True, text=True, timeout=2400)
    for line in r.stdout.splitlines():
        if "us/packet" in line or "live fraction" in line:
            print(line, flush=True)
    if r.returncode != 0:
        print(f"ablate [{ab}] FAILED rc={r.returncode}", flush=True)
        print(r.stderr[-1500:], flush=True)
        break
