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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: big grad graphs take minutes to compile on
# CPU; cache them across pytest processes. (Env vars are ignored on this
# image — the config API works.)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
