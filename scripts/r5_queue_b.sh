#!/bin/bash
# Round-5 TPU queue B (launch after queue A prints QUEUE_A_DONE):
# int8 measurements, post-clamp bucketed re-bench, full bench.py record,
# hard-page spotter A/B, longer-schedule recipe.
# Ordered cheapest/highest-value first so a round cutoff loses the least.
set -x
cd /root/repo
mkdir -p runs/r5

# 0. hard-page detector P/R/H-mean, quad vs chain-polygon representer
#    (VERDICT r4 task #1 wants detector P/R/H-mean on hard pages; the poly
#    arm scores the curved-text representer of task #2 on chain-polygon GT)
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_quad.log
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml --representer poly \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_poly.log

# 0b. int8 quality gate for the DETECTION trunk (pairs with bench.py's
#     det_fwd_ms_int8 timing; VERDICT r4 task #4)
timeout 1200 python cli/eval.py experiments/seg_detector_hard.yaml --int8 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_det_hard_int8.log

# 1. int8 quality gate on the generalist recognizer (VERDICT r4 task #5)
timeout 1800 python scripts/eval_hard.py experiments/ctc_hard_mix.yaml --int8 \
  2>&1 | grep -v WARNING | tee runs/r5/eval_hard_mix_int8.log

# 2. full bench with int8 + device-timed batch-1 (tasks #4/#5/#6)
timeout 2400 python bench.py 2>&1 | tail -3 | tee runs/r5/bench_r5.log

# 3. post-clamp bucketed serving re-bench (ADVICE r4 #1)
timeout 1800 python scripts/bench_bucketed.py \
  2>&1 | grep -v WARNING | tee runs/r5/bench_bucketed_r5.log

# 3b. bucketed quality axis re-based onto HARD pages (VERDICT r4 #1)
timeout 1800 python scripts/bench_bucketed.py --hard \
  2>&1 | grep -v WARNING | tee runs/r5/bench_bucketed_hard.log

# 4. hard-page spotter quality A/B (weak #4): train the hard spotter twin,
#    then run the A/B against the hard det + mixture rec
timeout 6000 python cli/train.py experiments/shared_spotter_hard.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_spotter_hard.log
timeout 1800 python scripts/bench_spotter.py --hard \
  2>&1 | grep -v WARNING | tee runs/r5/bench_spotter_hard.log

# 5. longer schedule (task #3): 8192-step mixture twin + hard eval
timeout 6000 python cli/train.py experiments/ctc_hard_mix_long.yaml \
  2>&1 | grep -v WARNING | tail -20 > runs/r5/train_mix_long.log
timeout 1800 python scripts/eval_hard.py experiments/ctc_hard_mix_long.yaml \
  2>&1 | grep -v WARNING | tee runs/r5/eval_hard_mix_long.log

echo QUEUE_B_DONE
