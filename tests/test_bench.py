"""bench.py driver contract: exactly one parseable JSON line on stdout.

The round driver records bench.py's stdout JSON; a schema break silently
loses the round's headline. This runs the real script on a tiny CPU
config (the orchestrator path stays off) and checks the line's shape.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(
        os.environ,
        TRACY_BENCH_ORCHESTRATE="0",
        TRACY_BENCH_FORCE_CPU="1",
        TRACY_BENCH_SCENE="/root/reference/data/scenes/cornell.scn",
        TRACY_BENCH_WIDTH="96", TRACY_BENCH_HEIGHT="96",
        TRACY_BENCH_SPP="1", TRACY_BENCH_FRAMES="1",
        TRACY_BENCH_REPS="2",
    )
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    json_lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, res.stdout
    j = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "reps", "spread",
                "fallback", "config"):
        assert key in j, key
    assert j["unit"] == "MRays/s"
    assert isinstance(j["value"], (int, float)) and j["value"] > 0
    assert len(j["reps"]) == 2
    # the config block must reflect what ACTUALLY ran
    assert j["config"]["pallas"] in (True, False)
