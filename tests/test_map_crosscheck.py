"""Machine cross-check of the mAP evaluator (VERDICT r2 missing #2).

pycocotools is not installable on this image, so this file implements the
published COCOeval algorithm a SECOND time — deliberately naive, pure-Python
loops, a completely different code structure from the vectorized
`train/metrics.py` — and property-tests that both implementations agree on
randomized inputs (crowds, ignored area ranges, score ties, empty images).
Two independent encodings of the published protocol agreeing across
randomized inputs is the strongest cross-check available without the
reference binary; the hand-derived pycocotools fixtures live in
tests/test_map.py.

Protocol source (same spec both implementations encode): the COCOeval
matching/accumulation rules published with pycocotools — greedy per
(image, category, IoU threshold) matching in descending score order, crowd
gts as multi-absorbing ignore-regions via intersection-over-detection-area,
valid-before-ignored gt preference, unmatched out-of-range detections
ignored, 101-point interpolated AP, AR as best recall at maxDets.
"""

from __future__ import annotations

import numpy as np
import pytest

from boosted_detr_tpu.train import metrics


# ---------------------------------------------------------------------------
# naive reference implementation (independent structure: per-detection
# python loops, explicit PR curve, no shared helpers with train/metrics.py)
# ---------------------------------------------------------------------------


def _iou_single(d, g, crowd):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    dw, dh, gw, gh = max(dw, 0.0), max(dh, 0.0), max(gw, 0.0), max(gh, 0.0)
    ix = max(0.0, min(dx + dw, gx + gw) - max(dx, gx))
    iy = max(0.0, min(dy + dh, gy + gh) - max(dy, gy))
    inter = ix * iy
    if crowd:
        denom = dw * dh
    else:
        denom = dw * dh + gw * gh - inter
    return inter / denom if denom > 0 else 0.0


def _naive_eval_one(dets, gts, thr, lo, hi):
    """One (image, class, threshold, area range): returns a list of
    (score, is_tp, is_ignored) per kept detection plus the count of
    non-ignored gts. ``dets`` = [(score, box)] already capped+sorted;
    ``gts`` = [(box, iscrowd, area)]."""
    gt_sorted = sorted(
        range(len(gts)),
        key=lambda g: bool(gts[g][1] or not (lo <= gts[g][2] <= hi)))
    gt_taken = [False] * len(gts)
    rows = []
    for score, dbox in dets:
        best_iou = min(thr, 1 - 1e-10)
        best_g = None
        for g in gt_sorted:
            gbox, gcrowd, garea = gts[g]
            g_ignored = bool(gcrowd or not (lo <= garea <= hi))
            if gt_taken[g] and not gcrowd:
                continue
            if best_g is not None:
                _, bcrowd, barea = gts[best_g]
                best_ignored = bool(
                    bcrowd or not (lo <= barea <= hi))
                if not best_ignored and g_ignored:
                    break  # holding a valid match; only ignored gts remain
            iou = _iou_single(dbox, gbox, gcrowd)
            if iou < best_iou:
                continue
            best_iou = iou
            best_g = g
        if best_g is None:
            dw, dh = max(dbox[2], 0.0), max(dbox[3], 0.0)
            d_ignored = not (lo <= dw * dh <= hi)
            rows.append((score, False, d_ignored))
        else:
            gbox, gcrowd, garea = gts[best_g]
            matched_ignored = bool(gcrowd or not (lo <= garea <= hi))
            gt_taken[best_g] = True
            rows.append((score, True, matched_ignored))
    n_valid_gt = sum(1 for gbox, gcrowd, garea in gts
                     if not gcrowd and lo <= garea <= hi)
    return rows, n_valid_gt


def _naive_ap(rows, n_gt):
    """101-point interpolated AP from (score, order_key) rows pooled over
    images: precision at the 101 recall points, precision envelope."""
    if n_gt == 0:
        return None
    # stable global sort by descending score (ties keep pooled order)
    order = sorted(range(len(rows)), key=lambda i: -rows[i][0])
    tp = fp = 0
    recalls, precisions = [], []
    for i in order:
        _, is_tp, ignored = rows[i]
        if ignored:
            continue
        if is_tp:
            tp += 1
        else:
            fp += 1
        recalls.append(tp / n_gt)
        precisions.append(tp / (tp + fp))
    if not recalls:
        return 0.0
    total = 0.0
    for r in np.linspace(0, 1, 101):
        best = 0.0
        for rc, pr in zip(recalls, precisions):
            if rc >= r and pr > best:
                best = pr
        total += best
    return total / 101.0


def naive_coco_map(predictions, ground_truths, max_det=100):
    """Independent COCOeval: returns {mAP, mAP50, mAP75, mAP_small/medium/
    large, AR@max_det}. Pure-python loops over every (class, threshold,
    area)."""
    thresholds = [0.5 + 0.05 * i for i in range(10)]
    ranges = {"all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
              "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10)}
    classes = sorted({int(l) for gt in ground_truths
                      for l in np.asarray(gt["labels"])})

    def image_class_dets(pred, cls):
        labels = np.asarray(pred["labels"])
        boxes = np.asarray(pred["boxes"], np.float32).reshape(-1, 4)
        scores = np.asarray(pred["scores"], np.float32)
        idx = [i for i in range(len(labels)) if labels[i] == cls]
        idx.sort(key=lambda i: -scores[i])  # python sort is stable
        return [(float(scores[i]), [float(v) for v in boxes[i]])
                for i in idx[:max_det]]

    def image_class_gts(gt, cls):
        labels = np.asarray(gt["labels"])
        boxes = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)
        crowd = np.asarray(gt.get("iscrowd", np.zeros(len(labels))))
        area = gt.get("area")
        out = []
        for i in range(len(labels)):
            if labels[i] != cls:
                continue
            a = (float(area[i]) if area is not None
                 else max(boxes[i][2], 0) * max(boxes[i][3], 0))
            out.append(([float(v) for v in boxes[i]], bool(crowd[i]), a))
        return out

    ap = {}  # (thr, cls, range) -> AP or None
    best_recall = {}  # (thr, cls, range) -> recall or None
    for cls in classes:
        for name, (lo, hi) in ranges.items():
            for thr in thresholds:
                rows, n_gt = [], 0
                for pred, gt in zip(predictions, ground_truths):
                    r, n = _naive_eval_one(
                        image_class_dets(pred, cls),
                        image_class_gts(gt, cls), thr, lo, hi)
                    rows.extend(r)
                    n_gt += n
                ap[(thr, cls, name)] = _naive_ap(rows, n_gt)
                if n_gt == 0:
                    best_recall[(thr, cls, name)] = None
                else:
                    tp = sum(1 for s, is_tp, ig in rows if is_tp and not ig)
                    best_recall[(thr, cls, name)] = tp / n_gt

    def mean(vals):
        # pycocotools summarize(): -1.0 when the metric is undefined
        vals = [v for v in vals if v is not None]
        return float(np.mean(vals)) if vals else -1.0

    out = {
        "mAP": mean([ap[(t, c, "all")] for t in thresholds
                     for c in classes]),
        "mAP50": mean([ap[(0.5, c, "all")] for c in classes]),
        "mAP75": mean([ap[(0.75, c, "all")] for c in classes]),
        f"AR@{max_det}": mean([best_recall[(t, c, "all")]
                               for t in thresholds for c in classes]),
    }
    for name in ("small", "medium", "large"):
        out[f"mAP_{name}"] = mean([ap[(t, c, name)] for t in thresholds
                                   for c in classes])
    return out


# ---------------------------------------------------------------------------
# randomized agreement tests
# ---------------------------------------------------------------------------


def _random_case(rng, n_images=8, n_classes=3, with_crowd=True,
                 with_area=True, score_ties=False):
    preds, gts = [], []
    for _ in range(n_images):
        n_d = int(rng.integers(0, 12))
        n_g = int(rng.integers(0, 6))
        boxes_d = np.stack([
            rng.uniform(0, 80, n_d), rng.uniform(0, 80, n_d),
            rng.uniform(1, 120, n_d), rng.uniform(1, 120, n_d)], -1) \
            if n_d else np.zeros((0, 4))
        scores = rng.uniform(0.05, 1.0, n_d)
        if score_ties and n_d >= 2:
            scores[1::2] = scores[0]  # force stable-sort behavior to matter
        boxes_g = np.stack([
            rng.uniform(0, 80, n_g), rng.uniform(0, 80, n_g),
            rng.uniform(1, 120, n_g), rng.uniform(1, 120, n_g)], -1) \
            if n_g else np.zeros((0, 4))
        # overlap some detections with gts so TPs exist
        for j in range(min(n_d, n_g)):
            if rng.uniform() < 0.6:
                boxes_d[j] = boxes_g[j] + rng.normal(0, 4, 4)
                boxes_d[j, 2:] = np.maximum(boxes_d[j, 2:], 1.0)
        gt = {"boxes": boxes_g.astype(np.float32),
              "labels": rng.integers(2, 2 + n_classes, n_g)}
        if with_crowd and n_g:
            gt["iscrowd"] = (rng.uniform(size=n_g) < 0.25).astype(np.int32)
        if with_area and n_g:
            # annotation areas (e.g. segmentation) differ from w*h
            gt["area"] = (boxes_g[:, 2] * boxes_g[:, 3]
                          * rng.uniform(0.4, 1.0, n_g)).astype(np.float32)
        preds.append({"boxes": boxes_d.astype(np.float32),
                      "scores": scores.astype(np.float32),
                      "labels": rng.integers(2, 2 + n_classes, n_d)})
        gts.append(gt)
    return preds, gts


KEYS = ("mAP", "mAP50", "mAP75", "mAP_small", "mAP_medium", "mAP_large")


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_matches_naive_random(seed):
    rng = np.random.default_rng(seed)
    preds, gts = _random_case(rng, with_crowd=(seed % 2 == 0),
                              with_area=(seed % 3 != 0),
                              score_ties=(seed % 2 == 1))
    got = metrics.compute_map(preds, gts)
    want = naive_coco_map(preds, gts)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k],
                                                            want[k])
    assert got["AR@100"] == pytest.approx(want["AR@100"], abs=1e-9)


def test_vectorized_matches_naive_crowd_heavy():
    """Crowds may absorb multiple detections and never count as npig."""
    rng = np.random.default_rng(99)
    preds, gts = _random_case(rng, n_images=6)
    for gt in gts:  # make most gts crowds
        n = len(gt["labels"])
        if n:
            gt["iscrowd"] = (rng.uniform(size=n) < 0.7).astype(np.int32)
    got = metrics.compute_map(preds, gts)
    want = naive_coco_map(preds, gts)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_vectorized_matches_naive_empty_images():
    """Images with zero dets / zero gts and classes present on one side."""
    preds = [
        {"boxes": np.zeros((0, 4), np.float32), "scores": np.zeros(0),
         "labels": np.zeros(0, np.int64)},
        {"boxes": np.asarray([[10, 10, 20, 20]], np.float32),
         "scores": np.asarray([0.9], np.float32),
         "labels": np.asarray([5], np.int64)},
    ]
    gts = [
        {"boxes": np.asarray([[10, 10, 20, 20]], np.float32),
         "labels": np.asarray([5], np.int64)},
        {"boxes": np.zeros((0, 4), np.float32),
         "labels": np.zeros(0, np.int64)},
    ]
    got = metrics.compute_map(preds, gts)
    want = naive_coco_map(preds, gts)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    # the one detection sits on the WRONG image: pure FP there, pure FN on
    # the image that holds the gt -> AP is 0 even at IoU 0.5
    assert got["mAP50"] == 0.0
