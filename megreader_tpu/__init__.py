"""megreader_tpu — a TPU-native scene-text detection & recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Megvii-CSG/MegReader (PyTorch, 2019): CTC / 2D-CTC / attentional
recognizers, FPN segmentation detection with device-side polygon
extraction, and the end-to-end page pipeline — all designed TPU-first
(static shapes, `lax.scan` recurrences, Pallas kernels on the hot path,
`jax.sharding.Mesh` + pjit data parallelism).

Layer map (cf. SURVEY.md §1):
  core/      config system (YAML -> object graph), registry, charsets
  ops/       XLA + Pallas kernels: CTC, 2D-CTC, decode, resize, CCL, sampling
  models/    flax backbones, sequence encoders, decoder heads, assembly
  data/      datasets + per-sample process chains (device-first ingest)
  postproc/  representers (raw output -> polygons/strings), measurers
  train/     train step, optimizer/schedules, checkpointing, logging
  parallel/  mesh construction, sharding rules, distributed utilities
  pipelines/ recognizer / detector / end-to-end predictors
"""

__version__ = "0.1.0"
