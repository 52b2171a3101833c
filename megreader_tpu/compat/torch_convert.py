"""torch checkpoint -> flax variables converter.

The bit-for-bit greedy-decode parity target (BASELINE.json north_star)
requires loading reference PyTorch checkpoints into the flax models. This
module converts a torch ``state_dict`` whose module names mirror our flax
module names (see ``compat.torch_ref`` for the test-side twin; an alias
table can remap real reference checkpoints whose names differ).

Conventions handled:
  conv weight   (O, I, kH, kW) -> kernel (kH, kW, I, O)
  linear weight (O, I)         -> kernel (I, O)
  batchnorm     weight/bias    -> scale/bias (params);
                running_mean/var -> mean/var (batch_stats)
  lstm          weight_ih/hh, bias_ih/hh -> w_ih/w_hh/b_ih/b_hh verbatim
                (our scan LSTM uses torch gate order [i,f,g,o] by design)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    name_map: Optional[Dict[str, str]] = None,
) -> Dict[str, Dict]:
    """-> {'params': ..., 'batch_stats': ...} nested dicts of np arrays.

    ``name_map``: optional prefix-rewrite table applied to torch keys first
    (for converting checkpoints whose module naming differs from ours).
    """
    params: Dict = {}
    batch_stats: Dict = {}

    items = {}
    for key, tensor in state_dict.items():
        if name_map:
            for old, new in name_map.items():
                if key.startswith(old):
                    key = new + key[len(old):]
                    break
        items[key] = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)

    bn_prefixes = {
        k[: -len(".running_mean")] for k in items if k.endswith(".running_mean")
    }

    for key, arr in items.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        prefix, leaf = ".".join(parts[:-1]), parts[-1]
        path = tuple(parts[:-1])
        if prefix in bn_prefixes:
            if leaf == "weight":
                _set(params, path + ("scale",), arr)
            elif leaf == "bias":
                _set(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _set(batch_stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _set(batch_stats, path + ("var",), arr)
            continue
        if leaf in ("w_ih", "w_hh", "b_ih", "b_hh", "weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            canonical = {"weight_ih": "w_ih", "weight_hh": "w_hh", "bias_ih": "b_ih", "bias_hh": "b_hh"}.get(leaf, leaf)
            _set(params, path + (canonical,), arr)
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                _set(params, path + ("kernel",), arr.T)
            else:
                _set(params, path + ("scale",), arr)
            continue
        if leaf == "bias":
            _set(params, path + ("bias",), arr)
            continue
        raise ValueError(f"unhandled torch key {key!r}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def tree_shapes(tree) -> Dict:
    import jax

    return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def assert_tree_compatible(converted, reference):
    """Raise with a readable diff if shapes/keys mismatch."""
    import jax

    c_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    r_flat = dict(jax.tree_util.tree_flatten_with_path(reference)[0])
    c_keys, r_keys = set(map(str, c_flat)), set(map(str, r_flat))
    missing = r_keys - c_keys
    extra = c_keys - r_keys
    if missing or extra:
        raise ValueError(f"param tree mismatch.\n  missing: {sorted(missing)}\n  extra: {sorted(extra)}")
    for k in c_flat:
        cs, rs = tuple(c_flat[k].shape), tuple(r_flat[str(k)].shape) if isinstance(k, str) else tuple(r_flat[k].shape)
        if cs != rs:
            raise ValueError(f"shape mismatch at {k}: converted {cs} vs model {rs}")
