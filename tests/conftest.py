"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths (mesh/pjit/shard_map) are exercised without real
hardware via ``xla_force_host_platform_device_count`` (SURVEY.md §4). Must
run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
