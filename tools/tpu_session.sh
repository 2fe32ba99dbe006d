#!/bin/bash
# One batched TPU session per the wedge-avoidance protocol (CLAUDE.md):
# gate first, then the experiments passed as arguments, each under a
# generous timeout, all appending to one log. Never poll; read the log.
#
# The session runs from a SNAPSHOT of the last commit (git archive), so
# concurrent edits to the working tree cannot race a live session's
# imports (round-4 lesson: experiments crashed with NameError when
# renderer.py changed under them mid-run). Logs still land in the repo.
#
# usage: nohup bash tools/tpu_session.sh LOGFILE "cmd1" "cmd2" ... &
set -u
LOG="$1"; shift
case "$LOG" in
    /*) ;;
    *) LOG="/root/repo/$LOG" ;;
esac

SNAP=$(mktemp -d /tmp/tracy_sess_XXXX)
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
# Native artifacts rebuild on first use; copy the built .so if present.
cp /root/repo/native/*.so "$SNAP/native/" 2>/dev/null
cd "$SNAP"

echo "=== TPU session $(date) snapshot=$SNAP @$(git -C /root/repo rev-parse --short HEAD) ===" >> "$LOG"

echo "--- gate ---" >> "$LOG"
timeout 1800 python -u tools/tpu_gate.py >> "$LOG" 2>&1
if [ $? -ne 0 ]; then
    echo "GATE FAILED — aborting session (leave the chip alone >=30min)" >> "$LOG"
    exit 1
fi

i=0
for cmd in "$@"; do
    i=$((i+1))
    echo "--- experiment $i: $cmd ---" >> "$LOG"
    timeout 3000 bash -c "$cmd" >> "$LOG" 2>&1
    echo "--- experiment $i exit: $? ---" >> "$LOG"
done
echo "=== session done $(date) ===" >> "$LOG"
rm -rf "$SNAP"
