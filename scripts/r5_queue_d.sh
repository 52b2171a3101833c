#!/bin/bash
# Round-5 queue D: launched by a supervisor AFTER queue C (shell pid as $1).
# Re-runs the two bucketed serving benches that failed in queue B:
#   - non-hard (post-clamp ADVICE r4 #1 numbers) hit its 1800 s timeout;
#   - --hard crashed on the from_yaml registry bug (fixed: Experiment.
#     from_yaml now self-registers the component catalog).
# Then the small-text recipe experiment if its config exists.
APID=${1:?pass queue C shell pid}
while kill -0 "$APID" 2>/dev/null; do sleep 30; done
set -x
cd /root/repo
mkdir -p runs/r5

timeout 3600 python scripts/bench_bucketed.py \
  2>&1 | grep -v WARNING | tee runs/r5/bench_bucketed_r5.log

timeout 3600 python scripts/bench_bucketed.py --hard \
  2>&1 | grep -v WARNING | tee runs/r5/bench_bucketed_hard.log

if [ -f experiments/ctc_hard_small.yaml ]; then
  timeout 6000 python cli/train.py experiments/ctc_hard_small.yaml \
    2>&1 | grep -v WARNING | tail -20 > runs/r5/train_small.log
  timeout 1800 python scripts/eval_hard.py experiments/ctc_hard_small.yaml \
    2>&1 | grep -v WARNING | tee runs/r5/eval_hard_small.log
fi

echo QUEUE_D_DONE
