#!/bin/sh
# Round-5 persistent watcher: retry the health gate indefinitely (axon
# outages can last hours), then run the r5 unattended queue.  Same shape
# as tools/onchip_watch.sh but pointing at onchip_session_r5.sh.
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r5
echo $$ > /tmp/onchip_r5/watch.pid
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5/watch.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip_r5/watch.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting queue" >> /tmp/onchip_r5/watch.log
    if sh tools/onchip_session_r5.sh >> /tmp/onchip_r5/watch.log 2>&1; then
      echo "QUEUE DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip_r5/watch.log
      break
    fi
    echo "QUEUE GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip_r5/watch.log
  fi
  sleep 240
done
