"""Disk data path: ICDAR dir-pair / list-file round trip (SURVEY.md §2.2).

scripts/make_disk_dataset.py exports the synthetic distribution into the
reference's file formats; these tests prove the export and the disk
datasets agree with the in-memory source (the full train-from-disk proof
runs on TPU via cli/train.py — RESULTS.md).
"""

import os
import subprocess
import sys

import numpy as np

from megreader_tpu.data import SyntheticDetectionDataset, SyntheticRecognitionDataset
from megreader_tpu.data.datasets import DetectionICDARDataset, RecognitionListDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_icdar_roundtrip(tmp_path):
    from make_disk_dataset import export_detection

    src = SyntheticDetectionDataset(n=3, hw=(256, 256), seed=5, gt_maps=False,
                                    max_rotate=15, max_persp=0.05)
    export_detection(src, str(tmp_path))
    ds = DetectionICDARDataset(
        str(tmp_path / "images"), str(tmp_path / "gts"), target_hw=(256, 256)
    )
    assert len(ds) == 3
    for i in range(3):
        a, b = src[i], ds[i]
        assert b["image"].shape == (256, 256, 3)
        assert len(b["polygons"]) == len(a["polygons"])
        assert b["texts"] == a["texts"]
        for pa, pb in zip(a["polygons"], b["polygons"]):
            # int-rounded coords on disk; identity resize (same target size)
            assert np.max(np.abs(np.asarray(pa) - np.asarray(pb))) <= 0.51
        # pixel content survives PNG round trip exactly
        assert np.array_equal(a["image"], b["image"])


def test_listfile_roundtrip(tmp_path):
    from make_disk_dataset import export_recognition

    src = SyntheticRecognitionDataset(n=4, seed=7)
    export_recognition(src, str(tmp_path))
    ds = RecognitionListDataset(str(tmp_path / "list.txt"))
    assert len(ds) == 4
    for i in range(4):
        a, b = src[i], ds[i]
        assert b["text"] == a["text"]
        assert tuple(b["size"]) == tuple(a["size"])
        h, w = a["size"]
        assert np.array_equal(a["image"][:h, :w], b["image"][:h, :w])


def test_icdar_ignore_regions(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "gts").mkdir()
    import cv2

    cv2.imwrite(str(tmp_path / "images" / "x.png"), np.zeros((64, 64, 3), np.uint8))
    (tmp_path / "gts" / "gt_x.txt").write_text(
        "1,1,20,1,20,10,1,10,hello\n30,30,60,30,60,40,30,40,###\n"
    )
    ds = DetectionICDARDataset(
        str(tmp_path / "images"), str(tmp_path / "gts"), target_hw=(64, 64)
    )
    s = ds[0]
    assert s["ignore"] == [False, True]
    assert s["texts"][0] == "hello"


def test_loader_process_workers_match_threads():
    """worker_mode='process' (the reference's forked num_workers analog)
    must produce byte-identical batches to thread workers — only faster on
    GIL-bound __getitem__."""
    import numpy as np

    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.data.loader import Loader, detection_collate_polys

    ds = SyntheticDetectionDataset(
        n=8, hw=(128, 128), seed=5, gt_maps=False, max_rotate=20
    )
    out = {}
    for mode in ("thread", "process"):
        ld = Loader(
            ds, 4, detection_collate_polys, shuffle=False, workers=2,
            worker_mode=mode, prefetch=0,
        )
        out[mode] = [b for b in ld]
        ld.close()
    for bt, bp in zip(out["thread"], out["process"]):
        np.testing.assert_array_equal(bt["image"], bp["image"])
        np.testing.assert_array_equal(bt["polys"], bp["polys"])
