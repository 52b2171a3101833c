#!/usr/bin/env python
"""Export the bench detector's trained variables to a committed asset.

The driver benches in whatever environment it wakes up in; `runs/` is
gitignored, so a truly fresh checkout would force bench.py to retrain
(and cold-compile — ~9 min on axon) inside its own timing window. This
exports the latest trained SegDetector variables (params + batch_stats,
no optimizer state) as float16 msgpack into ``assets/bench_det_fp16.msgpack``
(~12 MB), which `bench._ensure_trained_detector` restores as its last
resort before retraining.

Usage: python scripts/export_bench_det.py [--from runs/eval_e2e/det]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REPO = __file__.rsplit("/", 2)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--src", default=None,
        help="workspace with checkpoints/ (default: runs/eval_e2e/det, "
        "then runs/bench/det)",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "assets", "bench_det_fp16.msgpack")
    )
    args = ap.parse_args()

    import jax

    # host-side export: never touch (or contend for) the TPU
    jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.train import CheckpointManager

    candidates = (
        [args.src]
        if args.src
        else [
            os.path.join(REPO, "runs", "eval_e2e", "det"),
            os.path.join(REPO, "runs", "bench", "det"),
        ]
    )
    src = step = None
    for ws in candidates:
        if os.path.isdir(os.path.join(ws, "checkpoints")):
            mgr = CheckpointManager(ws)
            if mgr.latest_step() is not None:
                src, step = ws, int(mgr.latest_step())
                break
    if src is None:
        sys.exit("no trained detector checkpoint found under runs/")

    det = SegDetector()
    import jax.numpy as jnp

    # numpy-leaf template + explicit host RestoreArgs: the checkpoint's saved
    # shardings name TPU devices this CPU-only process can't reconstruct
    template = jax.tree.map(
        np.asarray, det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    variables = CheckpointManager(src).restore_variables_host(template, step=step)

    def shrink(x):
        x = np.asarray(x)
        return x.astype(np.float16) if np.issubdtype(x.dtype, np.floating) else x

    payload = {
        "step": step,
        "variables": jax.tree.map(shrink, serialization.to_state_dict(variables)),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(
        json.dumps(
            {
                "src": src,
                "step": step,
                "out": args.out,
                "mb": round(os.path.getsize(args.out) / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
