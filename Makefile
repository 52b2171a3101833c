# Convenience targets. Tests run on 8 virtual CPU devices (conftest pins
# the platform); benches run on whatever accelerator jax exposes.

.PHONY: test bench bench-e2e bench-train train-ctc train-ctc2d train-attn train-det entry

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-e2e:
	python scripts/bench_e2e.py

bench-train:
	python scripts/bench_train.py

train-ctc:
	python cli/train.py experiments/ctc_resnet18_synth.yaml

train-ctc2d:
	python cli/train.py experiments/ctc2d_resnet18_synth.yaml

train-attn:
	python cli/train.py experiments/attention_resnet18_synth.yaml

train-det:
	python cli/train.py experiments/seg_detector_synth.yaml

entry:
	python __graft_entry__.py
