#!/bin/sh
# Persistent wrapper: retry the health gate indefinitely (the axon tunnel
# can be down for hours), then run the unattended on-chip queue.  If the
# queue's OWN health gate fails (tunnel flapped between the two probes),
# keep watching instead of giving up; stop only after a queue run that
# got past its gate.
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/watch.pid
i=0
while :; do
  i=$((i+1))
  echo "health attempt $i @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
  if timeout 900 $PY tools/tpu_health.py >> /tmp/onchip/watch.log 2>&1; then
    echo "HEALTHY @ $(date -u +%H:%M:%S) -- starting queue" >> /tmp/onchip/watch.log
    if sh tools/onchip_session.sh >> /tmp/onchip/watch.log 2>&1; then
      echo "QUEUE DONE @ $(date -u +%H:%M:%S)" >> /tmp/onchip/watch.log
      break
    fi
    echo "QUEUE GATE FAILED @ $(date -u +%H:%M:%S) -- back to watching" >> /tmp/onchip/watch.log
  fi
  sleep 240
done
