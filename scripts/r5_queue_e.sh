#!/bin/bash
# Round-5 queue E: post-revert + post-measurer-fix detection numbers of
# record, then the s2d4 stem measurement. Waits for the prior queue.
APID=${1:-}
if [ -n "$APID" ]; then while kill -0 "$APID" 2>/dev/null; do sleep 20; done; fi
set -x
cd /root/repo
mkdir -p runs/r5

# detection decomposition with the RASTER-capable measurer + reverted chains
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  --representer poly --experiment.eval_dataset.curve_prob 1.0 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_curved_poly_rec.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  --representer poly \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_mixed_poly_rec.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_mixed_quad_rec.log

# s2d4 stem: trace-profiled A/B on the real chip
timeout 900 python scripts/profile_det_trace.py --iters 30 --logdir /tmp/det_trace_s2d4 --s2d4 \
  2>&1 | grep -vE "WARNING|UserWarning" | tee runs/r5/profile_det_s2d4.log
timeout 900 python scripts/profile_det_trace.py --iters 30 --logdir /tmp/det_trace_base \
  2>&1 | grep -vE "WARNING|UserWarning" | tee runs/r5/profile_det_base.log
echo QUEUE_E_DONE
