#!/usr/bin/env python
"""Detector training throughput: host-GT vs device-GT input pipelines.

Round-1 finding (RESULTS.md): host cv2 GT rasterization capped detector
training at ~20 im/s against a ~71 im/s device step. The device-GT path
(ops/gt_maps.py) ships only polygons and rasterizes inside the step prelude;
this harness measures the REAL loop (loader -> prepare -> step) for both
paths on the current backend. Target: >=55 im/s at batch 8, 640x640
(VERDICT r1 #4 done-criterion).
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def run(device_gt: bool, steps: int = 30, batch_size: int = 8,
        compute_dtype: str = "float32"):
    import jax

    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.train import OptimizerConfig, create_train_state, make_train_step

    ds = SyntheticDetectionDataset(n=batch_size * steps, hw=(640, 640))
    exp = Experiment(
        model=SegDetector(compute_dtype=compute_dtype),
        train_dataset=ds,
        batch_size=batch_size,
        device_gt=device_gt,
        use_mesh=False,
        optimizer=OptimizerConfig(name="sgd", lr=0.007, schedule="constant"),
    )
    tx = exp.optimizer.make()
    loader = exp.train_loader
    first = exp.prepare(next(iter(loader)))
    state = create_train_state(exp.model, jax.random.PRNGKey(0), first, tx)
    step_fn = make_train_step(exp.model, tx, mesh=None, donate=False)

    # warmup/compile
    state, m = step_fn(state, first)
    float(m["loss"])

    n_img = 0
    t0 = time.perf_counter()
    last = None
    for batch in loader:
        prepared = exp.prepare(batch)
        state, m = step_fn(state, prepared)
        last = m["loss"]
        n_img += batch["image"].shape[0]
    float(last)  # sync
    dt = time.perf_counter() - t0
    return n_img / dt


def main():
    host_ips = run(device_gt=False)
    dev_ips = run(device_gt=True)
    bf16_ips = run(device_gt=True, compute_dtype="bfloat16")
    print(
        json.dumps(
            {
                "detector_train_im_per_s_host_gt": round(host_ips, 1),
                "detector_train_im_per_s_device_gt": round(dev_ips, 1),
                "detector_train_im_per_s_device_gt_bf16": round(bf16_ips, 1),
                "speedup": round(dev_ips / host_ips, 2),
                "target": 55.0,
            }
        )
    )


if __name__ == "__main__":
    main()
