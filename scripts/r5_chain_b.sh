#!/bin/bash
# Supervisor: wait for queue A (pid in /tmp/r5_queue_a.pid... actual shell
# pid 22302) to exit, then launch queue B. Survives session restarts.
APID=${1:-22302}
while kill -0 "$APID" 2>/dev/null; do sleep 30; done
if grep -q QUEUE_A_DONE /tmp/r5_queue_a.out 2>/dev/null; then
  echo "[chain] queue A done cleanly, launching queue B"
else
  echo "[chain] queue A exited WITHOUT QUEUE_A_DONE — launching queue B anyway (evals tolerate missing ckpts)"
fi
bash /root/repo/scripts/r5_queue_b.sh > /tmp/r5_queue_b.out 2>&1
echo "[chain] queue B finished"
