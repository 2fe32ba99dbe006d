#!/usr/bin/env python3
"""Summarize a tpu_session.sh log: bench JSON lines, gate verdicts,
ablation/probe tables, failures. Usage:
    python tools/session_summary.py [logs/r3_session_s.log]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/r3_session_s.log"
    try:
        lines = open(path, errors="replace").read().splitlines()
    except OSError as e:
        print(f"no log: {e}")
        return 1

    cmd = ""
    print(f"== {path} ({len(lines)} lines) ==")
    for ln in lines:
        m = re.match(r"--- experiment \d+: (.*) ---", ln)
        if m:
            cmd = m.group(1)
            # Compress the command to its distinguishing env knobs.
            knobs = " ".join(re.findall(r"TRACY_\w+=\S+|PROBE_\w+=\S+", cmd))
            tool = "bench" if "bench.py" in cmd else cmd.split()[-1]
            cmd = f"{tool} [{knobs}]" if knobs else tool
            continue
        if re.match(r"--- experiment \d+ exit: [^0]", ln):
            print(f"FAIL  {cmd}  ({ln.strip()})")
            continue
        if ln.startswith("{"):
            try:
                j = json.loads(ln)
                print(f"{j.get('value'):>8} {j.get('unit','')}  "
                      f"{j.get('metric','?')}  <- {cmd}")
            except Exception:
                pass
            continue
        if any(k in ln for k in ("[gate] variant", "[gate] PASS",
                                 "[gate] FAIL", "GATE FAILED",
                                 "[parity]", "[grad]", "us/packet",
                                 "speed-of-light", "ablate")):
            print(f"    {ln.strip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
