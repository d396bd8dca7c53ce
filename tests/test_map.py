"""mAP evaluator tests: hand-computed oracle cases."""

import numpy as np
import pytest

from boosted_detr_tpu.train import metrics as M


def _pred(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float32),
            "scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels)}


def _gt(boxes, labels):
    return {"boxes": np.asarray(boxes, np.float32),
            "labels": np.asarray(labels)}


def test_iou_matrix():
    a = np.array([[0, 0, 1, 1]], np.float32)
    b = np.array([[0, 0, 1, 1], [0.5, 0, 1, 1], [2, 2, 1, 1]], np.float32)
    m = M._iou_matrix(a, b)
    assert np.allclose(m[0], [1.0, 0.5 / 1.5, 0.0], atol=1e-6)


def test_perfect_predictions_map_1():
    gt = [_gt([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.3, 0.3]], [2, 3])]
    pred = [_pred([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.3, 0.3]],
                  [0.9, 0.8], [2, 3])]
    res = M.compute_map(pred, gt)
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["mAP50"] == pytest.approx(1.0, abs=1e-6)


def test_no_predictions_map_0():
    gt = [_gt([[0.1, 0.1, 0.2, 0.2]], [2])]
    pred = [_pred(np.zeros((0, 4)), [], [])]
    res = M.compute_map(pred, gt)
    assert res["mAP"] == 0.0


def test_wrong_class_no_credit():
    gt = [_gt([[0.1, 0.1, 0.2, 0.2]], [2])]
    pred = [_pred([[0.1, 0.1, 0.2, 0.2]], [0.9], [3])]
    res = M.compute_map(pred, gt)
    assert res["mAP"] == 0.0


def test_half_recall_hand_value():
    # 2 GT of a class, one matched perfectly by the top-scored det, one
    # missed; a spurious low-scored det.
    gt = [_gt([[0.0, 0.0, 0.2, 0.2], [0.6, 0.6, 0.2, 0.2]], [2, 2])]
    pred = [_pred([[0.0, 0.0, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]],
                  [0.9, 0.5], [2, 2])]
    res = M.compute_map(pred, gt)
    # precision envelope: recall .5 at precision 1; AP = 101-pt interp
    # = mean over recall grid of (1 for r <= .5, 0 beyond) ~= 51/101
    assert res["mAP50"] == pytest.approx(51 / 101, abs=1e-6)


def test_localization_threshold_sensitivity():
    # IoU ~ 0.59 box: counts at IoU .5/.55 but not at .6+
    gt = [_gt([[0.0, 0.0, 1.0, 1.0]], [2])]
    pred = [_pred([[0.0, 0.0, 0.74, 1.0]], [0.9], [2])]  # IoU = .74
    res = M.compute_map(pred, gt)
    # matches at thresholds .5,.55,.6,.65,.7 (5 of 10) -> mAP = .5
    assert res["mAP"] == pytest.approx(0.5, abs=1e-6)
    assert res["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["mAP75"] == pytest.approx(0.0, abs=1e-6)


def test_duplicate_detections_penalized():
    gt = [_gt([[0.0, 0.0, 0.5, 0.5]], [2])]
    pred = [_pred([[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 0.5, 0.5]],
                  [0.9, 0.8], [2, 2])]
    res = M.compute_map(pred, gt)
    # second det is a duplicate FP, but full recall reached at precision 1
    assert res["mAP50"] == pytest.approx(1.0, abs=1e-6)


def test_multiclass_mean():
    gt = [_gt([[0, 0, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]], [2, 3])]
    pred = [_pred([[0, 0, 0.2, 0.2]], [0.9], [2])]  # class 3 missed
    res = M.compute_map(pred, gt)
    assert res["mAP"] == pytest.approx(0.5, abs=1e-3)
    assert res["per_class"][2] == pytest.approx(1.0, abs=1e-6)
    assert res["per_class"][3] == 0.0


def test_detr_predictions_to_eval():
    preds = {
        "category": np.array([[[0.7, 0.1, 0.15, 0.05],
                               [0.05, 0.05, 0.2, 0.7]]], np.float32),
        "boxes": np.array([[[0.1, 0.1, 0.2, 0.2],
                            [0.3, 0.3, 0.2, 0.2]]], np.float32),
    }
    out = M.detr_predictions_to_eval(preds)
    assert len(out) == 1
    assert out[0]["labels"].tolist() == [2, 3]
    assert np.allclose(out[0]["scores"], [0.15, 0.7])
