"""Cross-check boosted_detr_tpu.train.metrics against pycocotools.

This image has no pycocotools, so the evaluator's golden fixtures
(tests/test_map.py) carry hand-derived expected values. Run THIS script in
any environment that has pycocotools to verify the evaluator mechanically:
it feeds randomized detection problems (plus the checked-in fixtures'
dimensions: iscrowd, area ranges, maxDets) through both implementations and
asserts the 12 COCO metrics agree to 1e-6.

Usage: python scripts/gen_map_fixtures.py [--trials 20] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from boosted_detr_tpu.train import metrics as M  # noqa: E402


def random_problem(rng, n_images=4, n_classes=3, max_gt=6, max_det=12):
    gts, preds = [], []
    for _ in range(n_images):
        ng = int(rng.integers(0, max_gt + 1))
        g_boxes = np.stack([
            rng.uniform(0, 400, ng), rng.uniform(0, 400, ng),
            rng.uniform(4, 150, ng), rng.uniform(4, 150, ng)], -1) \
            if ng else np.zeros((0, 4))
        gts.append({
            "boxes": g_boxes.astype(np.float32),
            "labels": rng.integers(2, 2 + n_classes, ng),
            "iscrowd": (rng.uniform(size=ng) < 0.2).astype(np.int64),
        })
        nd = int(rng.integers(0, max_det + 1))
        # half the detections perturb a gt, half are random
        d_boxes = []
        for _ in range(nd):
            if ng and rng.uniform() < 0.5:
                base = g_boxes[rng.integers(ng)]
                d_boxes.append(base + rng.normal(0, 8, 4))
            else:
                d_boxes.append([rng.uniform(0, 400), rng.uniform(0, 400),
                                rng.uniform(4, 150), rng.uniform(4, 150)])
        d_boxes = (np.abs(np.asarray(d_boxes, np.float32))
                   if nd else np.zeros((0, 4), np.float32))
        preds.append({
            "boxes": d_boxes,
            "scores": rng.uniform(size=nd).astype(np.float32),
            "labels": rng.integers(2, 2 + n_classes, nd),
        })
    return preds, gts


def pycoco_eval(preds, gts):
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    classes = sorted({int(l) for g in gts for l in g["labels"]})
    coco = COCO()
    coco.dataset = {
        "images": [{"id": i + 1} for i in range(len(gts))],
        "categories": [{"id": c} for c in classes],
        "annotations": [],
    }
    ann_id = 1
    for i, g in enumerate(gts):
        for b, l, c in zip(g["boxes"], g["labels"], g["iscrowd"]):
            coco.dataset["annotations"].append({
                "id": ann_id, "image_id": i + 1, "category_id": int(l),
                "bbox": [float(x) for x in b], "iscrowd": int(c),
                "area": float(b[2] * b[3]),
            })
            ann_id += 1
    coco.createIndex()
    dets = []
    for i, p in enumerate(preds):
        for b, s, l in zip(p["boxes"], p["scores"], p["labels"]):
            dets.append({"image_id": i + 1, "category_id": int(l),
                         "bbox": [float(x) for x in b], "score": float(s)})
    coco_dt = coco.loadRes(dets) if dets else COCO()
    ev = COCOeval(coco, coco_dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    s = ev.stats
    return {"mAP": s[0], "mAP50": s[1], "mAP75": s[2], "mAP_small": s[3],
            "mAP_medium": s[4], "mAP_large": s[5], "AR@1": s[6],
            "AR@10": s[7], "AR@100": s[8], "AR_small": s[9],
            "AR_medium": s[10], "AR_large": s[11]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    try:
        import pycocotools  # noqa: F401
    except ImportError:
        print("pycocotools not installed — nothing to cross-check here. "
              "The hand-derived fixtures in tests/test_map.py remain the "
              "oracle on this image.")
        return
    rng = np.random.default_rng(args.seed)
    for t in range(args.trials):
        preds, gts = random_problem(rng)
        ours = M.compute_map(preds, gts)
        ref = pycoco_eval(preds, gts)
        for key, want in ref.items():
            if want == -1:  # pycocotools' 'undefined' marker
                continue
            got = ours.get(key, 0.0)
            assert abs(got - want) < 1e-6, (t, key, got, want)
        print(f"trial {t}: OK (mAP={ours['mAP']:.4f})")
    print(f"all {args.trials} trials agree with pycocotools")


if __name__ == "__main__":
    main()
