#!/bin/bash
# Round-3 tunnel watcher: launch session S the moment the TPU tunnel is
# usable. Two probes, cheapest first:
#   * every 30s: curl the remote-compile endpoint (port 8113) — instant
#     and side-effect-free when the tunnel is down;
#   * every 5min: a real device probe (subprocess, 120s timeout) — covers
#     the case where the tunnel returns on a path 8113 doesn't see.
# When either succeeds, wait 60s for the tunnel to settle, re-verify with
# the real probe, then hand off to tools/session_s.sh (which gates first).
cd /root/repo
PROBE='import jax, jax.numpy as jnp
d = jax.devices()[0]
assert d.platform != "cpu", d
x = jnp.ones((128, 128), jnp.float32)
assert float((x @ x)[0, 0]) == 128.0
print("probe-ok")'

log() { echo "[watch $(date +%H:%M:%S)] $*" >> logs/tunnel_wait.log; }

real_probe() { timeout 120 python -c "$PROBE" 2>/dev/null | grep -q probe-ok; }

log "watcher started (pid $$)"
i=0
while :; do
    if [ -f logs/r3_session_s.log ]; then
        log "session log exists; exiting"
        exit 0
    fi
    up=0
    code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" \
           -X POST http://127.0.0.1:8113/remote_compile 2>/dev/null)
    if [ "$code" != "000" ] && [ -n "$code" ]; then
        log "8113 answered (code $code)"
        up=1
    elif [ $((i % 10)) -eq 0 ] && real_probe; then
        log "device probe succeeded (8113 still dark)"
        up=1
    fi
    if [ "$up" = 1 ]; then
        sleep 60
        if real_probe; then
            log "tunnel confirmed; launching session S"
            bash tools/session_s.sh
            exit 0
        fi
        log "re-probe failed; resuming watch"
    fi
    i=$((i + 1))
    sleep 30
done
