"""COCO-protocol mAP evaluator.

The reference has NO mAP evaluation anywhere (SURVEY §5.5) — its only quality
metric is a masked pairwise IoU. BASELINE.json's quality target ("match
reference Fashionpedia mAP") needs a real evaluator, so this implements the
COCO protocol (no pycocotools on this image): AP averaged over IoU thresholds
0.50:0.95:0.05 with 101-point interpolated precision-recall, per-category,
greedy score-ordered matching, maxDets cap. Pure numpy, oracle-tested on hand
cases.

DETR emits a fixed set of predictions with no NMS (reference model.py:226-233
emits raw heads); class 0 (<PAD>) is the no-object class and is excluded.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of COCO-format [x, y, w, h] boxes: [len(a), len(b)]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ax0, ay0 = a[:, 0], a[:, 1]
    ax1, ay1 = a[:, 0] + np.maximum(a[:, 2], 0), a[:, 1] + np.maximum(
        a[:, 3], 0)
    bx0, by0 = b[:, 0], b[:, 1]
    bx1, by1 = b[:, 0] + np.maximum(b[:, 2], 0), b[:, 1] + np.maximum(
        b[:, 3], 0)
    ix0 = np.maximum(ax0[:, None], bx0[None, :])
    iy0 = np.maximum(ay0[:, None], by0[None, :])
    ix1 = np.minimum(ax1[:, None], bx1[None, :])
    iy1 = np.minimum(ay1[:, None], by1[None, :])
    inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _ap_from_matches(scores: np.ndarray, matched: np.ndarray,
                     num_gt: int) -> float:
    """101-point interpolated AP given per-detection scores and a bool
    'matched a ground truth' flag (already score-sorted)."""
    if num_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # monotone non-increasing precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # 101-point interpolation
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


def compute_map(predictions: Sequence[Dict[str, np.ndarray]],
                ground_truths: Sequence[Dict[str, np.ndarray]],
                iou_thresholds: Optional[np.ndarray] = None,
                max_dets: int = 100) -> Dict[str, float]:
    """COCO-style mAP.

    Args:
      predictions: per image: {'boxes' [P,4] COCO, 'scores' [P],
        'labels' [P] int}.
      ground_truths: per image: {'boxes' [n,4] COCO, 'labels' [n] int}.

    Returns dict with 'mAP' (mean over IoU 0.50:0.95), 'mAP50', 'mAP75',
    'per_class' (dict label -> AP).
    """
    thresholds = (IOU_THRESHOLDS if iou_thresholds is None
                  else np.asarray(iou_thresholds))
    assert len(predictions) == len(ground_truths)

    all_labels = sorted(
        {int(l) for gt in ground_truths for l in np.asarray(gt["labels"])})

    # per (class, threshold): gather detections across images
    ap = np.full((len(all_labels), len(thresholds)), np.nan)
    per_class: Dict[int, float] = {}
    for ci, cls in enumerate(all_labels):
        det_scores: List[np.ndarray] = []
        det_matched: List[np.ndarray] = [[] for _ in thresholds]
        num_gt = 0
        records = []  # (score, image_idx, iou_row against that image's gts)
        for img_idx, (pred, gt) in enumerate(zip(predictions, ground_truths)):
            p_mask = np.asarray(pred["labels"]) == cls
            g_mask = np.asarray(gt["labels"]) == cls
            p_boxes = np.asarray(pred["boxes"], np.float32)[p_mask]
            p_scores = np.asarray(pred["scores"], np.float32)[p_mask]
            g_boxes = np.asarray(gt["boxes"], np.float32)[g_mask]
            num_gt += len(g_boxes)
            if len(p_scores) > max_dets:
                keep = np.argsort(-p_scores)[:max_dets]
                p_boxes, p_scores = p_boxes[keep], p_scores[keep]
            ious = _iou_matrix(p_boxes, g_boxes)
            for k in range(len(p_scores)):
                records.append((float(p_scores[k]), img_idx, ious[k]))

        if num_gt == 0:
            continue
        records.sort(key=lambda r: -r[0])
        scores_sorted = np.asarray([r[0] for r in records])
        for ti, t in enumerate(thresholds):
            used: Dict[int, np.ndarray] = {}
            matched = np.zeros(len(records), bool)
            for k, (score, img_idx, iou_row) in enumerate(records):
                if len(iou_row) == 0:
                    continue
                taken = used.setdefault(img_idx,
                                        np.zeros(len(iou_row), bool))
                cand = np.where(~taken & (iou_row >= t), iou_row, -1.0)
                j = int(np.argmax(cand))
                if cand[j] > 0:
                    taken[j] = True
                    matched[k] = True
            ap[ci, ti] = _ap_from_matches(scores_sorted, matched, num_gt)
        per_class[cls] = float(np.nanmean(ap[ci]))

    valid = ~np.isnan(ap).all(axis=1)
    i50 = int(np.argmin(np.abs(thresholds - 0.50)))
    i75 = int(np.argmin(np.abs(thresholds - 0.75)))
    result = {
        "mAP": float(np.nanmean(ap[valid])) if valid.any() else 0.0,
        "mAP50": float(np.nanmean(ap[valid][:, i50])) if valid.any() else 0.0,
        "mAP75": (float(np.nanmean(ap[valid][:, i75]))
                  if valid.any() else 0.0),
        "per_class": per_class,
    }
    return result


def detr_predictions_to_eval(preds: Dict[str, np.ndarray],
                             score_threshold: float = 0.0
                             ) -> List[Dict[str, np.ndarray]]:
    """Model output dict -> per-image eval records. Score = max non-PAD/OOV
    class probability; label = argmax over real classes (ids >= 2); the
    <PAD>=0 no-object slot (and OOV=1) are excluded."""
    cat = np.asarray(preds["category"])  # [B, P, Vc]
    boxes = np.asarray(preds["boxes"])  # [B, P, 4]
    real = cat[:, :, 2:]
    labels = real.argmax(-1) + 2
    scores = real.max(-1)
    out = []
    for i in range(cat.shape[0]):
        keep = scores[i] >= score_threshold
        out.append({"boxes": boxes[i][keep], "scores": scores[i][keep],
                    "labels": labels[i][keep]})
    return out


def batch_to_ground_truth(batch: Dict[str, np.ndarray]
                          ) -> List[Dict[str, np.ndarray]]:
    """Pipeline batch -> per-image ground-truth records."""
    out = []
    b = len(batch["num_objects"])
    for i in range(b):
        n = int(batch["num_objects"][i])
        out.append({"boxes": np.asarray(batch["bbox"][i][:n], np.float32),
                    "labels": np.asarray(batch["category_ids"][i][:n])})
    return out


def evaluate_map(trainer, batches) -> Dict[str, float]:
    """Run the detector over batches and compute COCO mAP."""
    preds_all: List[Dict] = []
    gts_all: List[Dict] = []
    for batch in batches:
        preds = trainer.predict(batch["image"], decode_text=False)
        preds_all.extend(detr_predictions_to_eval(preds))
        gts_all.extend(batch_to_ground_truth(batch))
    return compute_map(preds_all, gts_all)
