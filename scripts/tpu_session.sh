#!/bin/bash
# Fire-when-TPU-returns measurement batch: extract A/B -> detector profile
# -> s2d stem timing -> driver bench. One TPU process at a time.
set -x
cd /root/repo
timeout 1800 python scripts/ab_unclip.py --pages 128 2>&1 | grep -v WARNING
timeout 900 python scripts/ab_extract_tpu.py 2>&1 | grep -v WARNING
timeout 900 python scripts/profile_det.py 2>&1 | grep -v WARNING
timeout 900 python scripts/profile_det.py --s2d 2>&1 | grep -v WARNING
timeout 900 python bench.py 2>&1 | tail -2
