"""Seed-variance study for the 8-device convergence asymmetry (VERDICT r4
weak #6 / task #7): round 4's single run showed single-device H-mean 0.952
vs mesh 1.000 and waved it off as "BN/reduction noise". Three seeds per arm
bound the seed variance: if the distributions overlap, the gap was noise;
if not, there is a loader/sharding asymmetry to find.

CPU-only (8-virtual-device mesh via tests/conftest semantics done inline);
safe to run alongside the TPU queue.

Usage: python scripts/seed_variance.py [--steps 640] [--seeds 3]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import megreader_tpu.all  # noqa: F401  (registry bootstrap)

HW = (160, 160)


def write_disk_dataset(root, n, seed, hw):
    import cv2

    from megreader_tpu.data import SyntheticDetectionDataset

    img_dir = os.path.join(root, "images")
    gt_dir = os.path.join(root, "gts")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    ds = SyntheticDetectionDataset(n=n, hw=hw, seed=seed, gt_maps=False, max_rotate=10.0)
    for i in range(n):
        it = ds[i]
        cv2.imwrite(
            os.path.join(img_dir, f"img_{i}.jpg"),
            cv2.cvtColor(it["image"], cv2.COLOR_RGB2BGR),
        )
        with open(os.path.join(gt_dir, f"gt_img_{i}.txt"), "w") as f:
            for poly, text in zip(it["polygons"], it["texts"]):
                coords = ",".join(str(int(round(v))) for v in poly.reshape(-1))
                f.write(f"{coords},{text}\n")
    return img_dir, gt_dir


def train_and_eval(workdir, tag, use_mesh, img_dir, gt_dir, steps, seed):
    from megreader_tpu.data.datasets import DetectionICDARDataset
    from megreader_tpu.evaluation import evaluate_detection
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.train import OptimizerConfig

    train_ds = DetectionICDARDataset(img_dir, gt_dir, target_hw=HW)
    eval_ds = DetectionICDARDataset(img_dir, gt_dir, target_hw=HW)
    exp = Experiment(
        model=SegDetector(fpn_dim=32, head_dim=8, width=32),
        train_dataset=train_ds,
        eval_dataset=eval_ds,
        batch_size=8,
        epochs=steps // (len(train_ds) // 8),
        workspace=os.path.join(workdir, tag),
        optimizer=OptimizerConfig(name="adam", lr=1e-3, schedule="constant"),
        use_mesh=use_mesh,
        log_every=200,
        seed=seed,
        loader_workers=2,
    )
    state = exp.make_trainer().train()
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return evaluate_detection(exp, variables)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=640)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        img_dir, gt_dir = write_disk_dataset(os.path.join(tmp, "data"), 64, 5, HW)
        table = {"single": [], "mesh8": []}
        for seed in range(args.seeds):
            for tag, mesh in (("single", False), ("mesh8", True)):
                m = train_and_eval(
                    tmp, f"{tag}_s{seed}", mesh, img_dir, gt_dir, args.steps, seed
                )
                table[tag].append(round(float(m["hmean"]), 4))
                print(f"{tag} seed={seed}: hmean={m['hmean']:.4f} {m}", flush=True)
        import numpy as np

        summary = {
            arm: {
                "hmeans": v,
                "mean": round(float(np.mean(v)), 4),
                "std": round(float(np.std(v)), 4),
                "min": min(v),
                "max": max(v),
            }
            for arm, v in table.items()
        }
        # overlap check: do the observed ranges intersect?
        lo = max(summary["single"]["min"], summary["mesh8"]["min"])
        hi = min(summary["single"]["max"], summary["mesh8"]["max"])
        summary["ranges_overlap"] = bool(lo <= hi)
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
