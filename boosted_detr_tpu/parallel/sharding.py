"""Parameter sharding rules (Megatron-style tensor parallelism over the
'model' mesh axis).

The reference has no TP at all (SURVEY §2.3); this is the designed-in
extension: attention Q/K/V projections and the FFN's first Dense are
column-split (output features over 'model'), the attention output projection
and FFN second Dense are row-split (input features over 'model'), so each
pair needs only one all-reduce which XLA inserts automatically under GSPMD.
Everything else (norms, biases, embeddings, conv kernels) stays replicated.
Default mesh has model=1, making every rule a no-op.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boosted_detr_tpu.parallel.mesh import MODEL_AXIS

# parameter-name endings -> how to split the kernel
_COLUMN_SPLIT = ("query_projection", "key_projection", "value_projection",
                 "dense_relu")
_ROW_SPLIT = ("output_projection", "dense_linear")


def _spec_for(path) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    if keys and keys[-1] == "kernel" and len(keys) >= 2:
        owner = keys[-2]
        if owner in _COLUMN_SPLIT:
            return P(None, MODEL_AXIS)  # [in, out] -> split out
        if owner in _ROW_SPLIT:
            return P(MODEL_AXIS, None)  # split in; XLA all-reduces the sum
    if keys and keys[-1] == "bias" and len(keys) >= 2:
        if keys[-2] in _COLUMN_SPLIT:
            return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """A params-shaped pytree of NamedShardings implementing the TP rules."""

    def to_sharding(path, leaf):
        spec = _spec_for(path)
        # guard: only shard axes that divide evenly, else replicate
        try:
            sizes = dict(zip(spec, leaf.shape))
        except Exception:
            return NamedSharding(mesh, P())
        for axis_name, dim in zip(spec, leaf.shape):
            if axis_name is not None and dim % mesh.shape[axis_name] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a full TrainState: params + matching opt_state entries
    (optimizer moments follow their parameters), everything else replicated."""
    p_sh = param_shardings(state.params, mesh)

    def like_params(tree):
        # map any params-shaped subtree inside opt_state to param shardings
        try:
            jax.tree_util.tree_structure(tree)
        except Exception:
            return None
        if jax.tree_util.tree_structure(tree) == \
                jax.tree_util.tree_structure(state.params):
            return p_sh
        return None

    opt_sh = jax.tree_util.tree_map(
        lambda t: like_params(t) or NamedSharding(mesh, P()),
        state.opt_state, is_leaf=lambda t: like_params(t) is not None)

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=rep, params=p_sh, batch_stats=jax.tree_util.tree_map(
            lambda _: rep, state.batch_stats),
        opt_state=opt_sh)
