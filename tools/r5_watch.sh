#!/bin/bash
# Round-5 tunnel watcher: when the device probe succeeds (the 8113 HTTP
# code alone is NOT sufficient — sessions B/C stalled while 8113 kept
# answering 400), wait for it to hold twice 60s apart, then launch the
# session script passed as $1 (default tools/session_r5d.sh). One-shot.
cd /root/repo
SESSION="${1:-tools/session_r5d.sh}"
STAMP="logs/r5_watch_$(basename "$SESSION" .sh).log"
PROBE='import jax, jax.numpy as jnp
d = jax.devices()[0]
assert d.platform != "cpu", d
x = jnp.ones((128, 128), jnp.float32)
assert float((x @ x)[0, 0]) == 128.0
print("probe-ok")'

log() { echo "[r5watch $(date +%H:%M:%S)] $*" >> "$STAMP"; }
real_probe() { timeout 120 python -c "$PROBE" 2>/dev/null | grep -q probe-ok; }

log "watcher started (pid $$) for $SESSION"
while :; do
    if real_probe; then
        log "probe ok; settling 60s"
        sleep 60
        if real_probe; then
            log "probe held; launching $SESSION"
            bash "$SESSION"
            exit 0
        fi
        log "re-probe failed; resuming"
    fi
    sleep 120
done
