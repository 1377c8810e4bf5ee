#!/bin/sh
# Health-retry wrapper for the r5d queue (tools/onchip_session_r5d.sh).
# Detached launch: sh tools/onchip_watch_r5d.sh & echo $! > /tmp/onchip_r5d.pid
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r5d
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5d/watch.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip_r5d/watch.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting r5d queue" >> /tmp/onchip_r5d/watch.log
    if sh tools/onchip_session_r5d.sh >> /tmp/onchip_r5d/watch.log 2>&1; then
      echo "QUEUE DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5d/watch.log
      break
    fi
    echo "QUEUE GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip_r5d/watch.log
  fi
  sleep 240
done
