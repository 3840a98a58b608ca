"""Device mesh construction.

The reference is single-process/single-device (no DP/TP/PP anywhere — see
SURVEY §2.4); multi-chip scaling is new TPU-native capability.  We use a 2-D
logical mesh ("data", "model"): batch shards ride the "data" axis, tensor-
parallel weight shards ride "model".  XLA (GSPMD) inserts the collectives —
all-reduce of activations across "model", gradient all-reduce across "data" —
over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    n_model: tensor-parallel degree (must divide device count). The remaining
    factor becomes the data-parallel degree.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model parallelism {n_model}")
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
