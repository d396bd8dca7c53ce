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


# ---------------------------------------------------------------------------
# Round-2 protocol fixtures: iscrowd / area ranges / maxDets. Expected values
# are hand-derived by executing the published pycocotools COCOeval algorithm
# on paper (no pycocotools on this image; scripts/gen_map_fixtures.py
# re-derives them mechanically in any environment that has it).
# ---------------------------------------------------------------------------


def _gtc(boxes, labels, iscrowd):
    return {"boxes": np.asarray(boxes, np.float32),
            "labels": np.asarray(labels),
            "iscrowd": np.asarray(iscrowd)}


def test_crowd_gt_absorbs_detection_without_fp():
    """A detection inside a crowd region is ignored (iof match), not a FP;
    the crowd never counts toward num_gt."""
    gt = [_gtc([[0, 0, 10, 10], [20, 20, 50, 50]], [2, 2], [0, 1])]
    pred = [_pred([[20, 20, 25, 25], [0, 0, 10, 10], [100, 100, 5, 5]],
                  [0.9, 0.8, 0.7], [2, 2, 2])]
    res = M.compute_map(pred, gt)
    # effective sequence: TP(.8) then FP(.7), npig=1 -> AP=1 at every t
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR@100"] == pytest.approx(1.0, abs=1e-6)
    # sanity: without the crowd flag the same boxes give a leading FP
    gt_nc = [_gtc([[0, 0, 10, 10], [20, 20, 50, 50]], [2, 2], [0, 0])]
    assert M.compute_map(pred, gt_nc)["mAP"] < 0.6


def test_crowd_preference_and_threshold_rollover():
    """A detection overlapping a valid gt (IoU 2/3) AND a crowd prefers the
    valid gt while the IoU clears the threshold, then rolls over to the
    crowd (ignored) at higher thresholds."""
    gt = [_gtc([[0, 0, 10, 10], [0, 0, 100, 100]], [2, 2], [0, 1])]
    # inter with valid gt = 10x8 = 80, union = 200-80=120 -> IoU 2/3
    pred = [_pred([[0, 2, 10, 10]], [0.9], [2])]
    res = M.compute_map(pred, gt)
    # t in {.50,.55,.60,.65}: TP (AP 1); t >= .70: matches crowd -> ignored,
    # no FP but recall 0 (AP 0) -> mAP = 4/10
    assert res["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["mAP75"] == pytest.approx(0.0, abs=1e-6)
    assert res["mAP"] == pytest.approx(0.4, abs=1e-6)


def test_area_range_ignores():
    """Small/large splits: out-of-range gts are ignored; unmatched
    detections outside the range are not false positives."""
    gt = [_gt([[0, 0, 10, 10], [300, 300, 200, 200]], [2, 2])]
    pred = [_pred([[50, 50, 200, 200], [0, 0, 10, 10]], [0.9, 0.8], [2, 2])]
    res = M.compute_map(pred, gt)
    # all: FP(.9) then TP(.8), npig=2: precision [0,.5]->envelope .5 up to
    # recall .5 -> AP = 51*0.5/101
    assert res["mAP"] == pytest.approx(51 * 0.5 / 101, abs=1e-6)
    # small: large gt ignored; the big FP is out-of-range-unmatched ->
    # ignored; remaining TP against 1 gt -> AP 1
    assert res["mAP_small"] == pytest.approx(1.0, abs=1e-6)
    # large: small gt ignored; its matching det inherits ignore; the big FP
    # counts; no TP -> AP 0
    assert res["mAP_large"] == pytest.approx(0.0, abs=1e-6)
    assert res["AR_small"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR_large"] == pytest.approx(0.0, abs=1e-6)


def test_max_dets_recall_caps():
    """AR@1 uses only the top-scored detection per image; AP uses the
    largest cap."""
    gt = [_gt([[0, 0, 10, 10], [20, 0, 10, 10], [40, 0, 10, 10]],
              [2, 2, 2])]
    pred = [_pred([[100, 0, 10, 10], [0, 0, 10, 10], [20, 0, 10, 10],
                   [40, 0, 10, 10]], [0.9, 0.8, 0.7, 0.6], [2, 2, 2, 2])]
    res = M.compute_map(pred, gt)
    assert res["AR@1"] == pytest.approx(0.0, abs=1e-6)
    assert res["AR@10"] == pytest.approx(1.0, abs=1e-6)
    assert res["AR@100"] == pytest.approx(1.0, abs=1e-6)
    # AP: FP,TP,TP,TP -> precision envelope 0.75 across recall -> AP .75
    assert res["mAP"] == pytest.approx(0.75, abs=1e-6)


def test_stable_score_tie_order():
    """Equal scores keep input order (pycocotools mergesort semantics)."""
    gt = [_gt([[0, 0, 10, 10]], [2])]
    # two dets with identical score: first is the TP
    pred = [_pred([[0, 0, 10, 10], [50, 50, 10, 10]], [0.5, 0.5], [2, 2])]
    res = M.compute_map(pred, gt)
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
