#!/bin/sh
# Watch wrapper for the r4 extra-session queue: retry the health gate
# indefinitely (tunnel outages last hours), then run onchip_session_r4b.sh
# once past its gate.  Kill via /tmp/onchip/watch_r4b.pid (never pkill).
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/watch_r4b.pid
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch_r4b.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip/watch_r4b.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting r4b queue" >> /tmp/onchip/watch_r4b.log
    if sh tools/onchip_session_r4b.sh >> /tmp/onchip/watch_r4b.log 2>&1; then
      echo "QUEUE DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch_r4b.log
      break
    fi
    echo "QUEUE GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip/watch_r4b.log
  fi
  sleep 240
done
