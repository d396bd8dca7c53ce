"""Attribute-quality metric: hand-computed oracle cases (VERDICT r4 #3).

The attributes head is one of the reference's two stated headline features
(reference README.md:5, prediction_heads.py:140-207); these tests pin the
scoring protocol of ``compute_attribute_metrics`` — matched-detection
conditioning, the 0.5 decode threshold (reference tokenizers.py:122-156
InverseTokenization semantics), PAD/OOV exclusion, and the per-attribute AP.
"""

import numpy as np
import pytest

from boosted_detr_tpu.train import metrics as M

# vocab layout: 0=<PAD>, 1=<OOV>, 2..5 real attributes
VA = 6


def _pred(boxes, scores, labels, attrs):
    return {"boxes": np.asarray(boxes, np.float32),
            "scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels),
            "attributes": np.asarray(attrs, np.float32)}


def _gt(boxes, labels, attrs):
    return {"boxes": np.asarray(boxes, np.float32),
            "labels": np.asarray(labels),
            "attributes": np.asarray(attrs, np.float32)}


def _hot(ids):
    h = np.zeros(VA, np.float32)
    h[list(ids)] = 1.0
    return h


def test_hand_computed_micro_f1_and_ap():
    """Two images, three gts, two matched detections (one det misses by IoU,
    one gt unmatched). Hand-arithmetic for every reported number."""
    box_a = [0.1, 0.1, 0.2, 0.2]
    box_b = [0.5, 0.5, 0.3, 0.3]
    far = [0.85, 0.05, 0.1, 0.1]
    gts = [
        _gt([box_a, box_b], [2, 3], [_hot([2, 3]), _hot([4])]),
        _gt([box_a], [2], [_hot([5])]),
    ]
    preds = [
        # det0 matches gt0 (IoU 1.0): decodes {2} (prob .9) of true {2,3}
        #   -> 1 TP, 1 FN; probs: attr2=.9, attr3=.4, attr4=.1, attr5=.2
        # det1 matches gt1 (IoU 1.0): decodes {4,5} of true {4}
        #   -> 1 TP (4), 1 FP (5)
        _pred([box_a, box_b], [0.9, 0.8], [2, 3],
              [[0, 0, 0.9, 0.4, 0.1, 0.2], [0, 0, 0.1, 0.2, 0.8, 0.6]]),
        # det far from gt (IoU 0) -> unmatched, attrs ignored entirely
        _pred([far], [0.95], [2], [[0, 0, 0.99, 0.99, 0.99, 0.99]]),
    ]
    r = M.compute_attribute_metrics(preds, gts)
    assert r["attr_matched"] == 2
    assert r["attr_match_recall"] == pytest.approx(2 / 3)
    # micro: TP=2 (attr2 on det0, attr4 on det1), decoded total=3 (2,4,5),
    # positives total=3 (2,3 on det0; 4 on det1)
    assert r["attr_precision"] == pytest.approx(2 / 3)
    assert r["attr_recall"] == pytest.approx(2 / 3)
    assert r["attr_F1"] == pytest.approx(2 / 3)
    # per-attribute AP over the 2 matched pairs:
    #  attr2: probs [.9, .1], pos [1, 0] -> AP 1.0
    #  attr3: probs [.4, .2], pos [1, 0] -> AP 1.0
    #  attr4: probs [.1, .8], pos [0, 1] -> AP 1.0
    #  attr5: no positives -> skipped
    assert r["attr_mAP"] == pytest.approx(1.0)


def test_ranking_ap_penalizes_inversion():
    """attr2 positive pair ranked BELOW a negative pair -> AP 1/2."""
    box = [0.1, 0.1, 0.2, 0.2]
    box2 = [0.6, 0.6, 0.2, 0.2]
    gts = [_gt([box, box2], [2, 2], [_hot([2]), _hot([])])]
    preds = [_pred([box, box2], [0.9, 0.8], [2, 2],
                   [[0, 0, 0.3, 0, 0, 0], [0, 0, 0.7, 0, 0, 0]])]
    r = M.compute_attribute_metrics(preds, gts)
    assert r["attr_matched"] == 2
    assert r["attr_mAP"] == pytest.approx(0.5)


def test_category_aware_matching():
    """A perfect-IoU detection with the WRONG category must not match."""
    box = [0.1, 0.1, 0.2, 0.2]
    gts = [_gt([box], [2], [_hot([2])])]
    preds = [_pred([box], [0.9], [3], [[0, 0, 1, 0, 0, 0]])]
    r = M.compute_attribute_metrics(preds, gts)
    assert r["attr_matched"] == 0
    assert r["attr_F1"] == 0.0


def test_pad_oov_columns_excluded():
    """Confident PAD/OOV attribute probs never count for or against."""
    box = [0.1, 0.1, 0.2, 0.2]
    gts = [_gt([box], [2], [_hot([2])])]
    preds = [_pred([box], [0.9], [2], [[0.99, 0.99, 0.9, 0, 0, 0]])]
    r = M.compute_attribute_metrics(preds, gts)
    assert r["attr_precision"] == pytest.approx(1.0)
    assert r["attr_recall"] == pytest.approx(1.0)
    assert r["attr_F1"] == pytest.approx(1.0)


def test_attribute_multihot_from_batch():
    batch = {
        "num_objects": np.asarray([2, 1]),
        "attribute_ids": np.asarray([
            [[2, 3, 0], [4, 0, 0], [0, 0, 0]],
            [[5, 5, 0], [0, 0, 0], [0, 0, 0]],
        ]),
    }
    hots = M.attribute_multihot_from_batch(batch, VA)
    assert len(hots) == 2 and hots[0].shape == (2, VA)
    assert np.array_equal(hots[0][0], _hot([0, 2, 3]))  # PAD id rides along
    assert np.array_equal(hots[0][1], _hot([0, 4]))
    assert np.array_equal(hots[1][0], _hot([0, 5]))


def test_evaluate_map_fn_reports_attributes():
    """End-to-end: evaluate_map_fn merges attr metrics when the model emits
    an attribute head and batches carry attribute_ids."""
    box = [0.1, 0.1, 0.2, 0.2]
    batch = {
        "image": np.zeros((1, 8, 8, 3), np.float32),
        "bbox": np.asarray([[box, [0, 0, 0, 0]]], np.float32),
        "category_ids": np.asarray([[2, 0]]),
        "attribute_ids": np.asarray([[[2, 0], [0, 0]]]),
        "num_objects": np.asarray([1]),
    }

    def predict_fn(image):
        p = 1  # one perfect prediction + attr {2}
        cat = np.zeros((1, p, 4), np.float32)
        cat[0, 0, 2] = 0.9
        att = np.zeros((1, p, VA), np.float32)
        att[0, 0, 2] = 0.8
        boxes = np.asarray([[box]], np.float32)
        return {"category": cat, "attribute": att, "boxes": boxes}

    res = M.evaluate_map_fn(predict_fn, [batch], (8, 8))
    assert res["mAP50"] == pytest.approx(1.0)
    assert res["attr_F1"] == pytest.approx(1.0)
    assert res["attr_mAP"] == pytest.approx(1.0)
