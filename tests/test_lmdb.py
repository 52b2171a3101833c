"""LMDB dataset + vendored pure-Python reader (VERDICT r4 task #8).

The C ``lmdb`` package is absent in this image, so the fixture is written
by ``lmdb_lite.write_fixture_lmdb`` (a valid single-leaf database) and read
back through the full LMDBRecognitionDataset path (decode, canvas, label).
"""

import numpy as np
import pytest

from megreader_tpu.data.lmdb_lite import LmdbLiteError, Reader, write_fixture_lmdb


def _make_fixture(path, n=3):
    import cv2

    records = {b"num-samples": str(n).encode()}
    rng = np.random.default_rng(7)
    truths = []
    for i in range(n):
        h, w = int(rng.integers(8, 14)), int(rng.integers(10, 24))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)  # RGB truth
        ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        text = f"word{i}"
        records[f"image-{i + 1:09d}".encode()] = buf.tobytes()
        records[f"label-{i + 1:09d}".encode()] = text.encode()
        truths.append((img, text, (h, w)))
    write_fixture_lmdb(str(path), records)
    return records, truths


def test_reader_roundtrip(tmp_path):
    records, _ = _make_fixture(tmp_path / "db")
    r = Reader(str(tmp_path / "db"))
    assert r.entries == len(records)
    for k, v in records.items():
        assert r.get(k) == v, k
    assert r.get(b"missing-key") is None
    # in-order scan returns every record sorted by key
    items = list(r.items())
    assert [k for k, _ in items] == sorted(records)
    assert dict(items) == records
    r.close()


def test_dataset_through_lite_backend(tmp_path):
    import cv2

    _, truths = _make_fixture(tmp_path / "db")
    from megreader_tpu.data.lmdb_dataset import LMDBRecognitionDataset

    ds = LMDBRecognitionDataset(str(tmp_path / "db"), canvas_hw=(64, 256))
    assert len(ds) == len(truths)
    for i, (img, text, (h, w)) in enumerate(truths):
        it = ds[i]
        assert it["text"] == text
        assert tuple(it["size"]) == (h, w)
        # PNG is lossless: the canvas corner must equal the source image
        np.testing.assert_array_equal(it["image"][:h, :w], img)
        assert it["image"].shape == (64, 256, 3)
        assert (it["image"][h:, :] == 0).all() and (it["image"][:, w:] == 0).all()


def test_fixture_writer_refuses_overflow(tmp_path):
    big = {b"k": b"x" * 8192}
    with pytest.raises(LmdbLiteError):
        write_fixture_lmdb(str(tmp_path / "big"), big)


def test_missing_num_samples(tmp_path):
    write_fixture_lmdb(str(tmp_path / "empty"), {b"other": b"1"})
    from megreader_tpu.data.lmdb_dataset import LMDBRecognitionDataset

    with pytest.raises(ValueError):
        LMDBRecognitionDataset(str(tmp_path / "empty"))
