#!/bin/bash
set -x
cd /root/repo
timeout 1200 python __graft_entry__.py 2>&1 | grep -v WARNING | tail -5
echo "=== ENTRY_DONE rc=$? ==="
timeout 5400 python scripts/eval_e2e_hard.py --pages 96 --modes chain \
  2>&1 | grep -v WARNING | tee runs/r5/eval_e2e_hard_chainfix.log
echo "=== CHAIN_EVAL_DONE ==="
