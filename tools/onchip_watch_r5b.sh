#!/bin/sh
# Waits for the main r5 queue (onchip_watch_r5.sh) to exit, then runs the
# follow-up queue onchip_session_r5b.sh behind the same health-retry loop.
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r5
echo $$ > /tmp/onchip_r5/watch_b.pid
MAIN_PID=$(cat /tmp/onchip_r5/watch.pid 2>/dev/null)
while [ -n "$MAIN_PID" ] && kill -0 "$MAIN_PID" 2>/dev/null; do
  sleep 60
done
echo "main queue watcher exited @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5/watch_b.log
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5/watch_b.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip_r5/watch_b.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting r5b queue" >> /tmp/onchip_r5/watch_b.log
    if sh tools/onchip_session_r5b.sh >> /tmp/onchip_r5/watch_b.log 2>&1; then
      echo "QUEUE B DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5/watch_b.log
      break
    fi
    echo "QUEUE B GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip_r5/watch_b.log
  fi
  sleep 240
done
