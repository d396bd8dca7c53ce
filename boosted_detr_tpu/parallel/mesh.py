"""Device mesh construction and batch sharding.

Replaces reference: ModelComponents/parameters.py:59-95 (``StrategyOptions``
auto-selecting ``tf.distribute`` strategies) with the JAX-native equivalent:
a ``jax.sharding.Mesh`` over ("data", "model") axes + NamedSharding/pjit, so
XLA emits all collectives over ICI (SURVEY §5.8). Data parallelism (the
reference's only strategy) shards the batch over the 'data' axis; tensor
parallelism over 'model' is designed in via ``parallel.sharding`` rules (off
by default — the model is small — but exercised by the multi-chip dryrun).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = {DATA_AXIS: n, MODEL_AXIS: 1}
    data = shape.get(DATA_AXIS, 1)
    model = shape.get(MODEL_AXIS, 1)
    if data * model != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
