"""Precision utilities: bf16 inference casting.

TPU MXU runs bf16 at ~2x f32 throughput; for serving we cast the float
leaves of the param tree and the activations to bfloat16 (params are kept
in f32 at rest — the cast view is cheap and XLA folds it). Decode argmax is
unchanged by bf16 rounding for any confidently-trained model; the f32 path
remains the default for checkpoint-parity evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype=jnp.bfloat16):
    """Cast all floating-point leaves of a pytree to `dtype`."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
