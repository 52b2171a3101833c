"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths (mesh/pjit/shard_map) are exercised without real
hardware (SURVEY.md §4). NOTE: this machine's sitecustomize forces
``jax_platforms=axon,cpu`` (the real-TPU tunnel) regardless of env vars, so
we must override via ``jax.config.update`` before any device is touched —
env-var-only approaches silently run the whole suite on the single real
chip, serialized over the tunnel.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: big grad graphs take minutes to compile on
# CPU; cache them across pytest processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
