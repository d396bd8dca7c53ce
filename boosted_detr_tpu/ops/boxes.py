"""Box geometry primitives (pure jax.numpy, XLA-fusible, f32).

Replaces the reference's dependency on ``tensorflow_addons.losses.giou_loss``
(reference: ModelComponents/losses_and_metrics.py:15-18) and the numpy box
format converters (reference: ModelComponents/pipeline.py:66-88).

Formats
-------
- COCO:    ``[xmin, ymin, width, height]`` (label data; normalized [0,1])
- corners: ``[ymin, xmin, ymax, xmax]``   (the reference's "TF format")
- VOC:     ``[xmin, ymin, xmax, ymax]``

All functions operate on the trailing axis of size 4 and broadcast over any
leading shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def coco_to_corners(box: jnp.ndarray) -> jnp.ndarray:
    """COCO [x,y,w,h] -> corners [ymin,xmin,ymax,xmax]
    (reference: losses_and_metrics.py:59-66)."""
    xmin, ymin, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([ymin, xmin, ymin + h, xmin + w], axis=-1)


def corners_to_coco(box: jnp.ndarray) -> jnp.ndarray:
    """corners [ymin,xmin,ymax,xmax] -> COCO [x,y,w,h]
    (reference: pipeline.py:72-76)."""
    ymin, xmin, ymax, xmax = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([xmin, ymin, xmax - xmin, ymax - ymin], axis=-1)


def coco_to_voc(box: jnp.ndarray) -> jnp.ndarray:
    """COCO [x,y,w,h] -> VOC [xmin,ymin,xmax,ymax]
    (reference: pipeline.py:78-82)."""
    xmin, ymin, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([xmin, ymin, xmin + w, ymin + h], axis=-1)


def voc_to_coco(box: jnp.ndarray) -> jnp.ndarray:
    """VOC [xmin,ymin,xmax,ymax] -> COCO [x,y,w,h]
    (reference: pipeline.py:84-88)."""
    xmin, ymin, xmax, ymax = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([xmin, ymin, xmax - xmin, ymax - ymin], axis=-1)


def _divide_no_nan(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """x/y, 0 where y == 0 (tf.math.divide_no_nan semantics used by tfa)."""
    ok = den != 0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def iou_corners(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of corner-format boxes; broadcasts leading dims.

    Degenerate boxes (max < min) are treated as zero-area, matching
    tensorflow_addons' ``giou_loss(mode='iou')`` behavior.
    Returns shape = broadcast(a.shape[:-1], b.shape[:-1]).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_ymin, a_xmin, a_ymax, a_xmax = (a[..., 0], a[..., 1], a[..., 2], a[..., 3])
    b_ymin, b_xmin, b_ymax, b_xmax = (b[..., 0], b[..., 1], b[..., 2], b[..., 3])

    a_area = jnp.maximum(a_ymax - a_ymin, 0.0) * jnp.maximum(a_xmax - a_xmin, 0.0)
    b_area = jnp.maximum(b_ymax - b_ymin, 0.0) * jnp.maximum(b_xmax - b_xmin, 0.0)

    i_ymin = jnp.maximum(a_ymin, b_ymin)
    i_xmin = jnp.maximum(a_xmin, b_xmin)
    i_ymax = jnp.minimum(a_ymax, b_ymax)
    i_xmax = jnp.minimum(a_xmax, b_xmax)
    i_area = jnp.maximum(i_ymax - i_ymin, 0.0) * jnp.maximum(i_xmax - i_xmin, 0.0)

    union = a_area + b_area - i_area
    return _divide_no_nan(i_area, union)


def giou_corners(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Generalized IoU (Rezatofighi et al.) of corner boxes.

    giou = iou - (enclose_area - union) / enclose_area, in [-1, 1].
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_ymin, a_xmin, a_ymax, a_xmax = (a[..., 0], a[..., 1], a[..., 2], a[..., 3])
    b_ymin, b_xmin, b_ymax, b_xmax = (b[..., 0], b[..., 1], b[..., 2], b[..., 3])

    a_area = jnp.maximum(a_ymax - a_ymin, 0.0) * jnp.maximum(a_xmax - a_xmin, 0.0)
    b_area = jnp.maximum(b_ymax - b_ymin, 0.0) * jnp.maximum(b_xmax - b_xmin, 0.0)

    i_ymin = jnp.maximum(a_ymin, b_ymin)
    i_xmin = jnp.maximum(a_xmin, b_xmin)
    i_ymax = jnp.minimum(a_ymax, b_ymax)
    i_xmax = jnp.minimum(a_xmax, b_xmax)
    i_area = jnp.maximum(i_ymax - i_ymin, 0.0) * jnp.maximum(i_xmax - i_xmin, 0.0)

    union = a_area + b_area - i_area
    iou = _divide_no_nan(i_area, union)

    e_ymin = jnp.minimum(a_ymin, b_ymin)
    e_xmin = jnp.minimum(a_xmin, b_xmin)
    e_ymax = jnp.maximum(a_ymax, b_ymax)
    e_xmax = jnp.maximum(a_xmax, b_xmax)
    e_area = jnp.maximum(e_ymax - e_ymin, 0.0) * jnp.maximum(e_xmax - e_xmin, 0.0)

    return iou - _divide_no_nan(e_area - union, e_area)


def giou_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU (tfa ``giou_loss(mode='giou')`` semantics;
    reference: losses_and_metrics.py:15)."""
    return 1.0 - giou_corners(a, b)


def iou_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU (reference: losses_and_metrics.py:17)."""
    return 1.0 - iou_corners(a, b)
