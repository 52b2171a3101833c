#!/bin/bash
set -x
cd /root/repo
timeout 5400 python scripts/eval_e2e_hard.py --pages 96 --modes chain   2>&1 | grep -v WARNING | tee runs/r5/eval_e2e_hard_chainfit.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml   --representer poly --experiment.eval_dataset.curve_prob 1.0   2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_curved_poly_fix.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml   --experiment.eval_dataset.curve_prob 1.0   2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_curved_quad_fix.log
echo CHAIN_EVAL2_DONE
