#!/bin/bash
# Round-5 queue C: post-bilinear-fix re-measurements. Launch by the
# supervisor AFTER queue B (pid passed as $1) exits.
#   1. hard-page e2e re-run — the chain arms now ride the ruled (bilinear)
#      band unwarp (the round-5 fix); perspective arms double as a
#      stability check against the morning run.
#   2. detector-eval decomposition: the mixed hard eval's quad H-mean
#      (0.649) conflates "curved GT punishes quads under polygon IoU"
#      with detector quality — measure straight-only and curved-only
#      separately, quad vs poly representer.
APID=${1:?pass queue B shell pid}
while kill -0 "$APID" 2>/dev/null; do sleep 30; done
set -x
cd /root/repo
mkdir -p runs/r5

timeout 3600 python scripts/eval_e2e_hard.py --pages 96 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_e2e_hard_fixed.log

timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  --experiment.eval_dataset.curve_prob 0.0 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_straight_quad.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  --experiment.eval_dataset.curve_prob 1.0 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_curved_quad.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  --representer poly --experiment.eval_dataset.curve_prob 1.0 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_curved_poly.log

echo QUEUE_C_DONE
