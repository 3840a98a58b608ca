"""Pytree helpers."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def count_params(tree) -> int:
    """Total number of elements across all leaves."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def tree_paths(tree) -> list[str]:
    """'/'-joined key paths of all leaves."""
    out = []
    for path, _ in jax.tree_util.tree_leaves_with_path(tree):
        out.append("/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path))
    return out


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves to dtype (e.g. bf16 serving weights)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
