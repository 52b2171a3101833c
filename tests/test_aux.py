"""Aux subsystem tests: logger, webviewer, profiling timer, charsets."""

import json
import os
import urllib.request

import numpy as np


def test_logger_jsonl_and_meters(tmp_path):
    from megreader_tpu.train import Logger

    lg = Logger(str(tmp_path), use_tensorboard=False)
    lg.add_scalars(1, {"loss": 2.0})
    lg.add_scalars(2, {"loss": 1.0})
    assert lg.meters["loss"].avg == 1.5
    lg.report(0, 2, 0.01, 100.0)
    assert lg.meters["loss"].count == 0  # reset after report
    lg.metrics(2, {"accuracy": 0.9})
    lg.close()
    lines = open(os.path.join(tmp_path, "train_metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0]["loss"] == 2.0
    assert any("eval/accuracy" in r for r in recs)


def test_webviewer_serves_images():
    from megreader_tpu.utils import webviewer

    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    webviewer.imshow("test", img)
    port = webviewer.serve(port=18712)
    html = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read().decode()
    assert "test" in html
    png = urllib.request.urlopen(f"http://127.0.0.1:{port}/img/test").read()
    assert png[:4] == b"\x89PNG"


def test_step_timer_percentiles():
    from megreader_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.times = [0.01, 0.02, 0.03, 0.04, 0.10]
    assert t.p50 == 0.03
    assert t.p99 == 0.10


def test_full_charset():
    from megreader_tpu.core.charset import FULL_ALPHABET, Charset

    cs = Charset(FULL_ALPHABET, case_sensitive=True)
    ids, n = cs.encode("Hello, W0rld!", 32)
    assert cs.decode(ids[:n]) == "Hello, W0rld!"


def test_signal_monitor(tmp_path):
    from megreader_tpu.utils import SignalMonitor

    flag = tmp_path / "stop"
    sm = SignalMonitor(str(flag))
    assert not sm.should_stop()
    flag.write_text("")
    assert sm.should_stop()
    assert not flag.exists()  # consumed
    assert not sm.should_stop()
