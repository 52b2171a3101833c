#!/usr/bin/env python
"""Export synthetic data to disk in the reference's file formats.

The reference's bread-and-butter ingestion is list-file / ICDAR
dir-pair data from disk (SURVEY.md §2.2); this writes the same synthetic
distribution the in-memory datasets generate into those formats so the
FULL disk pipeline — DetectionICDARDataset / RecognitionListDataset ->
Loader -> cli/train.py -> cli/eval.py — can be exercised end to end
(VERDICT r2 missing #2):

  out/
    det/{train,eval}/images/page_00000.png         ICDAR dir pair
    det/{train,eval}/gts/gt_page_00000.txt         x1,y1,...,x4,y4,text
    rec/{train,eval}/crops/word_00000.png          word crops
    rec/{train,eval}/list.txt                      path<TAB>transcript

Usage: python scripts/make_disk_dataset.py [--out runs/data] [--pages 256]
       [--crops 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def export_detection(ds, out_dir):
    import cv2

    img_dir = os.path.join(out_dir, "images")
    gt_dir = os.path.join(out_dir, "gts")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        name = f"page_{i:05d}"
        cv2.imwrite(
            os.path.join(img_dir, name + ".png"),
            cv2.cvtColor(s["image"], cv2.COLOR_RGB2BGR),
        )
        lines = []
        for poly, ign, text in zip(s["polygons"], s["ignore"], s["texts"]):
            coords = ",".join(str(int(round(v))) for v in np.asarray(poly).reshape(-1))
            lines.append(f"{coords},{'###' if ign else text}")
        with open(os.path.join(gt_dir, f"gt_{name}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return len(ds)


def export_recognition(ds, out_dir):
    import cv2

    crop_dir = os.path.join(out_dir, "crops")
    os.makedirs(crop_dir, exist_ok=True)
    entries = []
    for i in range(len(ds)):
        s = ds[i]
        h, w = s["size"]
        rel = f"crops/word_{i:05d}.png"
        # store the tight crop (not the padded canvas): the list dataset
        # re-pastes into its own canvas, like real crop files
        cv2.imwrite(
            os.path.join(out_dir, rel),
            cv2.cvtColor(s["image"][:h, :w], cv2.COLOR_RGB2BGR),
        )
        entries.append(f"{rel}\t{s['text']}")
    with open(os.path.join(out_dir, "list.txt"), "w") as f:
        f.write("\n".join(entries) + "\n")
    return len(entries)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        __file__.rsplit("/", 2)[0], "runs", "data"))
    ap.add_argument("--pages", type=int, default=256)
    ap.add_argument("--eval-pages", type=int, default=32)
    ap.add_argument("--crops", type=int, default=2048)
    ap.add_argument("--eval-crops", type=int, default=256)
    ap.add_argument("--rotate", type=float, default=15.0)
    ap.add_argument("--persp", type=float, default=0.05)
    args = ap.parse_args()

    from megreader_tpu.data import (
        SyntheticDetectionDataset,
        SyntheticRecognitionDataset,
    )

    for split, n, seed in (("train", args.pages, 100), ("eval", args.eval_pages, 101)):
        ds = SyntheticDetectionDataset(
            n=n, seed=seed, gt_maps=False,
            max_rotate=args.rotate, max_persp=args.persp,
        )
        k = export_detection(ds, os.path.join(args.out, "det", split))
        print(f"det/{split}: {k} pages")
    for split, n, seed in (("train", args.crops, 200), ("eval", args.eval_crops, 201)):
        ds = SyntheticRecognitionDataset(n=n, seed=seed)
        k = export_recognition(ds, os.path.join(args.out, "rec", split))
        print(f"rec/{split}: {k} crops")


if __name__ == "__main__":
    main()
