#!/bin/bash
# Round-5 chain C (relaunch after the 07:40 training-client wedge: a
# stray smoke test attached to the real TPU — the axon sitecustomize
# ignores JAX_PLATFORMS env vars — and its mid-operation kill lost the
# training client's in-flight RPC; the device itself recovered, the
# client did not). Resume det training from its checkpoint, then the
# hard-page e2e eval, then queue B.
set -x
cd /root/repo
mkdir -p runs/r5

# resume toward the full 40-epoch budget (trainer treats epochs as a
# TOTAL budget; restores the latest checkpoint and extends)
timeout 4500 python cli/train.py experiments/seg_detector_hard.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_det_hard.log

# Phase C: the hard-page e2e eval (VERDICT r4 missing #1)
timeout 3600 python scripts/eval_e2e_hard.py --pages 96 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_e2e_hard.log

echo QUEUE_A_DONE
bash /root/repo/scripts/r5_queue_b.sh > /tmp/r5_queue_b.out 2>&1
echo "[chain] queue B finished"
