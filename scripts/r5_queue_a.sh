#!/bin/bash
# Round-5 TPU queue A: run the already-built hard-tier evals FIRST
# (VERDICT r4 missing #1/#4), then train the checkpoints eval_e2e_hard
# needs, then run it. One TPU process at a time; everything logged.
set -x
cd /root/repo
mkdir -p runs/r5

# --- Phase A: evals of the round-4-trained queued experiments (fast) ---
timeout 1200 python scripts/eval_hard.py experiments/ctc_hard_mix.yaml \
  2>&1 | grep -v WARNING | tee runs/r5/eval_hard_mix.log
timeout 1200 python scripts/eval_hard.py experiments/ctc_hard48.yaml \
  2>&1 | grep -v WARNING | tee runs/r5/eval_hard48.log
timeout 900 python scripts/bench_crops_hw.py --hw 48 160 \
  2>&1 | grep -v WARNING | tee runs/r5/bench_crops_48x160.log
timeout 900 python scripts/bench_crops_hw.py --hw 32 100 \
  2>&1 | grep -v WARNING | tee runs/r5/bench_crops_32x100.log

# --- Phase B: trainings needed by eval_e2e_hard (sequential) ---
timeout 3000 python cli/train.py experiments/ctc_hard.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_ctc_hard.log
timeout 3000 python cli/train.py experiments/ctc_curved_ab.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_ctc_curved.log
timeout 3000 python cli/train.py experiments/ctc2d_curved_ab.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_ctc2d_curved.log
timeout 6000 python cli/train.py experiments/seg_detector_hard.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_det_hard.log

# --- Phase C: the hard-page e2e eval (VERDICT r4 missing #1) ---
timeout 3600 python scripts/eval_e2e_hard.py --pages 96 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_e2e_hard.log

echo QUEUE_A_DONE
