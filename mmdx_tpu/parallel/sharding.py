"""Parameter sharding rules: Megatron-style tensor parallelism via GSPMD.

We annotate shardings on the weight pytree and on batches, then let XLA insert
the collectives (the "pick a mesh, annotate, let XLA do the rest" recipe):

  * transformer FFN: wi [d, d_ff] column-sharded, wo [d_ff, d] row-sharded
    -> one all-reduce per FFN across "model";
  * attention q/k/v column-sharded over heads, output projection row-sharded
    -> one all-reduce per attention block;
  * fusion MLP + conditioning projection column/row split the same way;
  * embeddings, norms, biases, small heads, conv towers: replicated
    (ResNet-50 is 25M params — replication is cheaper than halo exchanges);
  * batches: leading axis sharded over "data".
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmdx_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, PartitionSpec factory) — first match wins; paths are
# "/"-joined pytree key paths like "params/text_encoder/bert/layer0/ffn_in/kernel".
_RULES: list[tuple[str, Any]] = [
    # BERT / generic attention projections
    (r"attn_[qkv]/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"attn_out/kernel$", lambda: P(MODEL_AXIS, None)),
    (r"ffn_in/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"ffn_out/kernel$", lambda: P(MODEL_AXIS, None)),
    # T5 attention + FFN
    (r"(self_attn|cross_attn)/[qkv]/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"(self_attn|cross_attn)/o/kernel$", lambda: P(MODEL_AXIS, None)),
    (r"ffn_wi/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"ffn_wo/kernel$", lambda: P(MODEL_AXIS, None)),
    # fusion MLP / conditioning projection
    (r"fusion/fuse_dense/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"fusion/cond_proj/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"cond_proj/kernel$", lambda: P(None, MODEL_AXIS)),
    (r"fuse_dense/kernel$", lambda: P(None, MODEL_AXIS)),
]


def spec_for_path(path: str) -> P:
    """Match rules against the tail of a '/'-joined key path (works whether or
    not the tree carries a leading 'params/' segment)."""
    for pattern, spec in _RULES:
        if re.search(r"(^|/)" + pattern, path):
            return spec()
    return P()  # replicate


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def variable_shardings(variables, mesh: Mesh):
    """PartitionSpec tree -> NamedSharding tree for a variables pytree.

    Sharded axes whose size doesn't divide the mesh axis fall back to
    replication (GSPMD requires divisibility for even shards)."""
    def one(path, leaf):
        spec = spec_for_path(_path_str(path))
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ok = True
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % sizes[axis] != 0:
                ok = False
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree_util.tree_map_with_path(one, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree onto the mesh according to the rules."""
    shardings = variable_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, shardings)


def batch_shardings(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))), batch
    )


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))
