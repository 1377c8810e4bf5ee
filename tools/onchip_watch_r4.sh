#!/bin/sh
# Persistent wrapper for the round-4 queue: retry the health gate
# indefinitely (axon tunnel outages can last hours), then run
# tools/onchip_session_r4.sh; if its own gate fails (tunnel flapped
# between probes), keep watching.  Stop only after a run that got past
# its gate.  Kill via:  kill $(cat /tmp/onchip/watch.pid)
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/watch.pid
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip/watch.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting r4 queue" >> /tmp/onchip/watch.log
    if sh tools/onchip_session_r4.sh >> /tmp/onchip/watch.log 2>&1; then
      echo "QUEUE DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
      break
    fi
    echo "QUEUE GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip/watch.log
  fi
  sleep 240
done
