"""Device mesh construction + sharding rules (SPMD data parallelism).

The TPU-native replacement for the reference's NCCL DDP (SURVEY.md §2.6 N8,
§5.8): a `jax.sharding.Mesh` over all chips; batches sharded on the 'data'
axis; parameters replicated; gradients reduced by XLA-inserted all-reduces
over ICI (within slice) / DCN (across hosts). The mesh carries a 'model'
axis (size 1 by default) so tensor-parallel shardings can be layered in
without re-plumbing — the reference's models are small (<50M params), so DP
is the only strategy it ships (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place stacked array leaves of a host batch onto the mesh, batch-split.

    Non-array entries (texts, polygon lists) pass through on host.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def is_primary() -> bool:
    """Rank-0 analog for logging/saving (reference: local_rank == 0)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (multi-host runs; no-op single-host).

    The torch.distributed.barrier() analog — e.g. before checkpoint reads.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
