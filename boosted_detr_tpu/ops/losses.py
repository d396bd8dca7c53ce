"""Loss primitives, reproducing the reference's exact formulas in pure JAX.

Replaces reference: ModelComponents/losses_and_metrics.py:13-72 (which leans on
Keras losses and tensorflow_addons C++/CUDA ops). Everything here is f32 and
XLA-fusible; the pairwise "cost array" forms additionally provide MXU-friendly
matmul decompositions (`*_cost`) that avoid materializing [B, O, P, V] tensors.

Conventions
-----------
- ``y`` denotes targets, ``p`` denotes predicted probabilities (not logits).
- Keras's BinaryCrossentropy internally clips probabilities to
  [eps, 1-eps] with eps=1e-7 and returns the mean over the last axis; we
  replicate both behaviors exactly so loss magnitudes match the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from boosted_detr_tpu.ops import boxes as box_ops

_KERAS_EPS = 1e-7

# Focal-loss defaults (tensorflow_addons SigmoidFocalCrossEntropy;
# reference: losses_and_metrics.py:19).
FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0


def safe_clip(p: jnp.ndarray) -> jnp.ndarray:
    """Clip probabilities to [.001, .999] (reference: losses_and_metrics.py:26)."""
    return jnp.clip(p, 0.001, 0.999)


def _keras_clip(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(p, _KERAS_EPS, 1.0 - _KERAS_EPS)


def bce_elementwise(y: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with Keras's internal eps-clipping."""
    p = _keras_clip(p.astype(jnp.float32))
    y = y.astype(jnp.float32)
    return -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def binary_crossentropy(y: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Keras BinaryCrossentropy(reduction=NONE): mean of elementwise BCE over
    the last axis (reference: losses_and_metrics.py:20-21)."""
    return jnp.mean(bce_elementwise(y, p), axis=-1)


def categorical_crossentropy_ls(y: jnp.ndarray, p: jnp.ndarray,
                                label_smoothing: float = 0.1) -> jnp.ndarray:
    """Keras CategoricalCrossentropy(label_smoothing=.1, reduction=NONE)
    (reference: losses_and_metrics.py:22-23; defined for parity)."""
    y = y.astype(jnp.float32)
    p = p.astype(jnp.float32)
    num_classes = y.shape[-1]
    y = y * (1.0 - label_smoothing) + label_smoothing / num_classes
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = _keras_clip(p)
    return -jnp.sum(y * jnp.log(p), axis=-1)


def exist_loss(y: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """BCE on the '<PAD>/no-object' class probability
    (reference: losses_and_metrics.py:33-37)."""
    return binary_crossentropy(y, safe_clip(p))


def category_loss(y_onehot: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Binary loss on just the true category: BCE(y, safe_clip(p) * y),
    meaned over the class axis (reference: losses_and_metrics.py:44-49).

    For one-hot ``y`` this equals
    ``(-log(safe_clip(p_true)) + (V-1) * -log(1 - eps)) / V``.
    """
    y = y_onehot.astype(jnp.float32)
    return binary_crossentropy(y, safe_clip(p) * y)


def category_match_loss(y_onehot: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Crossentropy without the logarithm: ``sum((1 - p) * y)`` over classes
    (reference losses_and_metrics.py:39-42 — defined there for matching
    costs but unused; provided for parity)."""
    return jnp.sum((1.0 - p.astype(jnp.float32))
                   * y_onehot.astype(jnp.float32), axis=-1)


def sigmoid_focal_elementwise(y: jnp.ndarray, p: jnp.ndarray,
                              alpha: float = FOCAL_ALPHA,
                              gamma: float = FOCAL_GAMMA) -> jnp.ndarray:
    """Elementwise sigmoid focal cross-entropy on probabilities
    (tensorflow_addons semantics; reference: losses_and_metrics.py:19)."""
    y = y.astype(jnp.float32)
    p = p.astype(jnp.float32)
    ce = bce_elementwise(y, p)
    p_t = y * p + (1.0 - y) * (1.0 - p)
    alpha_factor = y * alpha + (1.0 - y) * (1.0 - alpha)
    modulating = jnp.power(1.0 - p_t, gamma)
    return alpha_factor * modulating * ce


def attribute_loss(y: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Mean over the attribute axis of elementwise focal loss on clipped probs
    (reference: losses_and_metrics.py:51-57)."""
    return jnp.mean(sigmoid_focal_elementwise(y, safe_clip(p)), axis=-1)


def box_loss(y_coco: jnp.ndarray, p_coco: jnp.ndarray,
             giou_weight: float = 2.0, l2_weight: float = 5.0) -> jnp.ndarray:
    """2*GIoU-loss + 5*MSE(10*coords) on corner-converted boxes
    (reference: losses_and_metrics.py:68-72)."""
    y = box_ops.coco_to_corners(y_coco.astype(jnp.float32))
    p = box_ops.coco_to_corners(p_coco.astype(jnp.float32))
    giou = box_ops.giou_loss(y, p)
    l2 = jnp.mean(jnp.square(10.0 * y - 10.0 * p), axis=-1)
    return giou_weight * giou + l2_weight * l2


# ---------------------------------------------------------------------------
# Pairwise cost arrays.
#
# The reference broadcasts y_true to [B, O, 1, ...] against y_pred
# [B, 1, P, ...] and evaluates each loss pairwise
# (reference: losses_and_metrics.py:215-225). The generic form below does the
# same; the `*_cost` fast forms compute identical values without materializing
# the [B, O, P, V] intermediate, expressing the reductions as batched matmuls
# that XLA tiles onto the TPU MXU.
# ---------------------------------------------------------------------------


def pairwise(fn, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Generic pairwise cost: fn over [B,O,1,...] x [B,1,P,...] -> [B,O,P]
    (reference: losses_and_metrics.py:215-225)."""
    y_true = jnp.expand_dims(y_true, axis=-2)
    y_pred = jnp.expand_dims(y_pred, axis=-3)
    return fn(y_true, y_pred)


def category_cost(y_onehot: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ``category_loss`` as gather + constant: [B,O,Vc] x [B,P,Vc]
    -> [B,O,P].

    category_loss for one-hot rows reduces to
    ``(-log(safe_clip(p_c)) - (V-1)*log(1-eps)) / V`` where ``c`` is the true
    class, so the pairwise array is a gather of ``-log safe_clip(p)`` along
    classes — no [B,O,P,Vc] tensor is ever built.
    """
    y = y_onehot.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    v = y.shape[-1]
    neglog_p = -jnp.log(_keras_clip(safe_clip(p32)))  # [B,P,Vc]
    off_const = -jnp.log(1.0 - _KERAS_EPS)  # from BCE zeros against clipped 0
    # [B,O,Vc] @ [B,Vc,P] -> [B,O,P]; y is one-hot so this gathers neglog_p.
    gathered = jnp.einsum("bov,bpv->bop", y, neglog_p)
    return (gathered + (v - 1.0) * off_const) / v


def attribute_cost(y_multihot: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ``attribute_loss`` as a matmul: [B,O,Va] x [B,P,Va] -> [B,O,P].

    The focal loss is elementwise in (y, p) and y is binary, so
    ``focal(y, p) = y * f1(p) + (1-y) * f0(p)``; the mean over attributes is
    then ``(y . (f1-f0) + sum f0) / Va`` — a single MXU matmul.
    """
    y = y_multihot.astype(jnp.float32)
    pc = safe_clip(p.astype(jnp.float32))
    f1 = sigmoid_focal_elementwise(jnp.ones_like(pc), pc)  # [B,P,Va]
    f0 = sigmoid_focal_elementwise(jnp.zeros_like(pc), pc)  # [B,P,Va]
    va = y.shape[-1]
    dot = jnp.einsum("bov,bpv->bop", y, f1 - f0)
    return (dot + jnp.sum(f0, axis=-1)[:, None, :]) / va


def box_cost(y_coco: jnp.ndarray, p_coco: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ``box_loss``: [B,O,4] x [B,P,4] -> [B,O,P] (cheap broadcast —
    only 4 trailing elements)."""
    return pairwise(box_loss, y_coco, p_coco)


def iou_metric_pairwise(y_coco: jnp.ndarray, p_coco: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (corner-converted), used by the matched-IoU metric
    (reference: losses_and_metrics.py:188)."""
    y = box_ops.coco_to_corners(y_coco.astype(jnp.float32))
    p = box_ops.coco_to_corners(p_coco.astype(jnp.float32))
    return box_ops.iou_corners(y[..., :, None, :], p[..., None, :, :])
