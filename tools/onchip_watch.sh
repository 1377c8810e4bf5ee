#!/bin/sh
# Persistent wrapper: retry the health gate indefinitely (the axon tunnel
# can be down for hours), then run the unattended on-chip queue exactly once.
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip/watch.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting queue" >> /tmp/onchip/watch.log
    sh tools/onchip_session.sh >> /tmp/onchip/watch.log 2>&1
    echo "QUEUE EXITED @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
    break
  fi
  sleep 240
done
