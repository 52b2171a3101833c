"""YAML experiment configs -> live object graphs.

Reimplements the *semantics* of MegReader's ``concern/config.py`` [U]
(``Config.load/compile``, ``Configurable``, ``class:`` instantiation,
``import:`` composition, CLI dotted-key overrides) without its
reflection-over-modules machinery:

* An experiment YAML may carry ``import: [other.yaml, ...]``; imports are
  loaded first (depth-first) and the importing file's keys override theirs.
* Any mapping node with a ``class:`` key is instantiated from the component
  registry, with the remaining keys passed as constructor kwargs (after the
  same treatment, recursively). Lists are mapped element-wise.
* ``cmd``-style overrides: a flat dict of dotted keys
  (``train.loader.batch_size: 64``) applied onto the merged config before
  instantiation.
* ``$ref:`` string values of the form ``"$ref:path.to.node"`` are resolved
  against the merged root dict before instantiation, replacing MegReader's
  YAML-anchor reuse across imported files.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml

from .registry import COMPONENTS


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml(path: str, _seen: Optional[set] = None) -> Dict:
    """Load a YAML file, flattening its ``import:`` graph (cycles rejected)."""
    path = os.path.abspath(path)
    _seen = _seen or set()
    if path in _seen:
        raise ValueError(f"import cycle at {path}")
    _seen.add(path)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    merged: Dict = {}
    for imp in raw.pop("import", []) or []:
        if not os.path.isabs(imp):
            imp = os.path.join(os.path.dirname(path), imp)
        merged = _deep_merge(merged, load_yaml(imp, _seen))
    return _deep_merge(merged, raw)


def apply_overrides(cfg: Dict, overrides: Dict[str, Any]) -> Dict:
    """Apply ``{"a.b.c": v}`` dotted-key overrides (MegReader CLI ``--key v``)."""
    cfg = copy.deepcopy(cfg)
    for dotted, value in (overrides or {}).items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def _resolve_refs(node: Any, root: Dict) -> Any:
    if isinstance(node, str) and node.startswith("$ref:"):
        target: Any = root
        for p in node[len("$ref:"):].split("."):
            target = target[p]
        return _resolve_refs(target, root)
    if isinstance(node, dict):
        return {k: _resolve_refs(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_refs(v, root) for v in node]
    return node


def instantiate(node: Any):
    """Recursively turn ``class:``-tagged mappings into live objects."""
    if isinstance(node, dict):
        built = {k: instantiate(v) for k, v in node.items()}
        cls_name = built.pop("class", None)
        if cls_name is not None:
            return COMPONENTS.get(cls_name)(**built)
        return built
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


class Config:
    """End-to-end: YAML path (+ CLI overrides) -> object graph."""

    @staticmethod
    def load(path: str, overrides: Optional[Dict[str, Any]] = None) -> Dict:
        cfg = load_yaml(path)
        cfg = apply_overrides(cfg, overrides or {})
        return _resolve_refs(cfg, cfg)

    @staticmethod
    def compile(cfg: Dict):
        return instantiate(cfg)

    @staticmethod
    def build(path: str, overrides: Optional[Dict[str, Any]] = None):
        return Config.compile(Config.load(path, overrides))


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse trailing ``--key value`` pairs as dotted-key overrides.

    Values are YAML-parsed so ``--train.lr 1e-3`` becomes a float and
    ``--validate false`` a bool, mirroring MegReader's permissive CLI.
    """
    out: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise ValueError(f"expected --key, got {tok!r}")
        key = tok[2:]
        if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            raw_val = argv[i + 1]
            val = yaml.safe_load(raw_val)
            if isinstance(val, str):
                # YAML 1.1 rejects "1e-3"-style floats; accept them anyway.
                try:
                    val = float(val)
                except ValueError:
                    pass
            out[key] = val
            i += 2
        else:
            out[key] = True
            i += 1
    return out
