"""Prediction heads (reference: ModelComponents/prediction_heads.py).

Each head: optional token-count resize (a 1x1 'Conv1D' over the transposed
token axis, used only when the incoming token count differs from
``num_preds`` — reference prediction_heads.py:53-56), then
Dense(hidden, relu, he_normal) -> Norm -> Dense(out) -> activation. Output
activations are pinned to f32 (the reference pins Softmax/Sigmoid layers to
float32 for mixed-precision safety, prediction_heads.py:44, :111, :180).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from boosted_detr_tpu.models.backbone import make_norm


class _TokenResize(nn.Module):
    """Dense along the token axis: [B,T,D] -> [B,num_preds,D] (equivalent to
    the reference's Permute/Conv1D(kernel=1)/Permute trick,
    prediction_heads.py:35-37, :53-56)."""

    num_preds: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[1] == self.num_preds:
            return x
        xt = jnp.swapaxes(x, 1, 2)  # [B, D, T]
        xt = nn.Dense(self.num_preds, dtype=self.dtype, name="resize")(xt)
        return jnp.swapaxes(xt, 1, 2)


class BoxPredictionHead(nn.Module):
    """Boxes via the reference's expanded sigmoid ``3*sigmoid(x/100) - 1``
    (reference prediction_heads.py:44), output COCO-normalized [x,y,w,h]."""

    hidden_dim: int
    num_preds: int
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, train: bool = False):
        x = _TokenResize(self.num_preds, self.dtype)(features)
        x = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        x = make_norm(self.norm, train, self.dtype, "norm")(x)
        x = nn.Dense(4, kernel_init=nn.initializers.glorot_normal(),
                     dtype=jnp.float32, name="box_coords")(
                         x.astype(jnp.float32))
        return 3.0 * nn.sigmoid(x / 100.0) - 1.0  # f32


class SingleClassPredictionHead(nn.Module):
    """Softmax category probabilities; class 0 (<PAD>) doubles as the
    'no object' class (reference prediction_heads.py:72-131)."""

    num_classes: int
    hidden_dim: int
    num_preds: int
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, train: bool = False):
        x = _TokenResize(self.num_preds, self.dtype)(features)
        x = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        x = make_norm(self.norm, train, self.dtype, "norm")(x)
        x = nn.Dense(self.num_classes,
                     kernel_init=nn.initializers.glorot_normal(),
                     dtype=jnp.float32, name="logits")(x.astype(jnp.float32))
        return nn.softmax(x, axis=-1)  # f32


class MultiClassPredictionHead(nn.Module):
    """Independent sigmoid probabilities per class (multi-label attributes,
    reference prediction_heads.py:140-201)."""

    num_classes: int
    hidden_dim: int
    num_preds: int
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, train: bool = False):
        x = _TokenResize(self.num_preds, self.dtype)(features)
        x = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        x = make_norm(self.norm, train, self.dtype, "norm")(x)
        x = nn.Dense(self.num_classes,
                     kernel_init=nn.initializers.glorot_normal(),
                     dtype=jnp.float32, name="logits")(x.astype(jnp.float32))
        return nn.sigmoid(x)  # f32
