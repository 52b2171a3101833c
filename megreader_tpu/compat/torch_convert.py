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
        # Verbatim passthrough is restricted to a known-good allowlist of
        # leaves defined with identical layout on both sides by construction
        # (``embedding`` tables, the attention net's ``pos2d``). Anything
        # else fails fast here — a typo'd name_map or unexpected checkpoint
        # key must not surface later as a confusing param-tree mismatch
        # (ADVICE r2 #4).
        if leaf in ("embedding", "pos2d"):
            _set(params, path + (leaf,), arr)
            continue
        raise KeyError(
            f"unhandled torch checkpoint key {key!r} (leaf {leaf!r}); add a "
            "conversion rule or rename via name_map"
        )

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_torchvision_resnet(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """torchvision ``resnet{18,34,50,101}`` state_dict -> flax ResNet('det').

    The reference initializes its detection backbones from ImageNet-pretrain
    URLs (SURVEY.md §2.3); this is the ingestion path for those weights.
    Renames torchvision keys (conv1, bn1, layerI.J.*, downsample.K) to our
    module tree (stem_conv, stem_bn, layerI_blockJ.*, downsample_conv/bn)
    and drops the classifier head (fc.*), then applies the standard
    conversion rules.
    """
    import re

    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("fc."):
            continue  # classification head: not part of the trunk
        nk = k
        if nk.startswith("conv1."):
            nk = "stem_conv." + nk[len("conv1."):]
        elif nk.startswith("bn1."):
            nk = "stem_bn." + nk[len("bn1."):]
        nk = re.sub(r"^layer(\d+)\.(\d+)\.", r"layer\1_block\2.", nk)
        nk = nk.replace(".downsample.0.", ".downsample_conv.")
        nk = nk.replace(".downsample.1.", ".downsample_bn.")
        renamed[nk] = v
    return convert_state_dict(renamed)


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
