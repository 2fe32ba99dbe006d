#!/bin/bash
# One batched TPU session per the wedge-avoidance protocol (CLAUDE.md):
# gate first, then the experiments passed as arguments, each under a
# generous timeout, all appending to one log. Never poll; read the log.
#
# usage: nohup bash tools/tpu_session.sh LOGFILE "cmd1" "cmd2" ... &
set -u
LOG="$1"; shift
cd /root/repo

echo "=== TPU session $(date) ===" >> "$LOG"

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
