"""Panoptic Quality (PQ/SQ/RQ): hand-derived protocol cases + a live
DETRPanoptic end-to-end smoke.

The reference has no panoptic metric (its panoptic modules are dark code,
SURVEY §2); compute_pq follows the published panopticapi rules, so the
expectations below are derivable by hand from the paper's definitions.
"""

import numpy as np
import pytest

from boosted_detr_tpu.train.metrics import (VOID, compute_pq,
                                            detr_panoptic_segments,
                                            evaluate_pq, panoptic_canvas)


def _canvas(h, w, segments):
    """segments: list of (id, row0, row1, col0, col1) painted in order."""
    c = np.full((h, w), VOID, np.int32)
    for i, r0, r1, c0, c1 in segments:
        c[r0:r1, c0:c1] = i
    return c


def test_pq_perfect_match():
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10), (1, 6, 10, 0, 10)])
    cats = np.asarray([3, 7])
    r = compute_pq([(gt, cats, None)], [(gt.copy(), cats.copy())])
    assert r["PQ"] == r["SQ"] == r["RQ"] == 1.0
    assert r["num_categories"] == 2


def test_pq_partial_overlap_hand_value():
    # gt: rows 0-3 (40 px); pred: rows 0-2 (30 px) -> IoU 30/40 = 0.75
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10)])
    pr = _canvas(10, 10, [(0, 0, 3, 0, 10)])
    cats = np.asarray([5])
    r = compute_pq([(gt, cats, None)], [(pr, cats)])
    assert r["RQ"] == 1.0
    np.testing.assert_allclose(r["SQ"], 0.75)
    np.testing.assert_allclose(r["PQ"], 0.75)


def test_pq_void_excluded_from_union():
    # pred spills 10 px onto VOID: union = 40 + 50 - 40 - 10 = 40 -> IoU 1.0
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10)])
    pr = _canvas(10, 10, [(0, 0, 5, 0, 10)])
    cats = np.asarray([5])
    r = compute_pq([(gt, cats, None)], [(pr, cats)])
    np.testing.assert_allclose(r["PQ"], 1.0)


def test_pq_category_must_match():
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10)])
    r = compute_pq([(gt, np.asarray([5]), None)],
                   [(gt.copy(), np.asarray([6]))])
    # cat 5: FN only -> PQ 0; cat 6: FP only -> PQ 0; averaged -> 0
    assert r["PQ"] == 0.0
    assert r["num_categories"] == 2


def test_pq_false_positive_on_void_discarded():
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10)])
    cats = np.asarray([5])
    # second pred segment lives entirely on VOID -> discarded, not an FP
    pr = _canvas(10, 10, [(0, 0, 4, 0, 10), (1, 6, 10, 0, 10)])
    r = compute_pq([(gt, cats, None)], [(pr, np.asarray([5, 5]))])
    np.testing.assert_allclose(r["PQ"], 1.0)  # TP=1, FP=0, FN=0


def test_pq_real_false_positive_counts():
    # two gt cats; a pred overlapping the WRONG-category gt area (not void)
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10), (1, 6, 10, 0, 10)])
    gt_cats = np.asarray([5, 7])
    pr = _canvas(10, 10, [(0, 0, 4, 0, 10), (1, 6, 10, 0, 10)])
    r = compute_pq([(gt, gt_cats, None)], [(pr, np.asarray([5, 5]))])
    # cat 5: TP(iou 1) + FP(second seg, mostly on cat-7 gt so NOT ignored)
    #   -> PQ_5 = 1 / (1 + 0.5) = 2/3 ; cat 7: FN -> 0 ; mean = 1/3
    np.testing.assert_allclose(r["PQ"], (1.0 / 1.5 + 0.0) / 2)


def test_pq_crowd_never_fn_and_absorbs_preds():
    gt = _canvas(10, 10, [(0, 0, 4, 0, 10), (1, 6, 10, 0, 10)])
    gt_cats = np.asarray([5, 5])
    crowd = np.asarray([False, True])
    # pred only covers the crowd region -> discarded (same-cat crowd), and
    # the non-crowd gt counts as FN
    pr = _canvas(10, 10, [(0, 6, 10, 0, 10)])
    r = compute_pq([(gt, gt_cats, crowd)], [(pr, np.asarray([5]))])
    # cat 5: TP=0, FP=0 (absorbed), FN=1 (the non-crowd gt) -> PQ 0
    assert r["PQ"] == 0.0
    assert r["num_categories"] == 1


def test_panoptic_canvas_painter_order():
    masks = np.zeros((2, 4, 4), np.uint8)
    masks[0, :, :] = 1          # first covers everything
    masks[1, 2:, :] = 1         # second (later) covers bottom half
    c = panoptic_canvas(masks, np.asarray([1, 2]))
    assert (c[:2] == 0).all() and (c[2:] == 1).all()


def test_detr_panoptic_segments_postprocess():
    # 2 queries, 6x6 masks, 4-class softmax (class 0 = PAD)
    cat = np.zeros((1, 2, 4), np.float32)
    cat[0, 0] = [0.1, 0.8, 0.05, 0.05]   # confident class 1
    cat[0, 1] = [0.6, 0.2, 0.1, 0.1]     # low non-PAD confidence -> dropped
    logits = np.full((1, 2, 6, 6), -5.0, np.float32)
    logits[0, 0, :3, :] = 5.0            # top half claimed by query 0
    logits[0, 1, 3:, :] = 5.0            # bottom half (dropped query)
    segs = detr_panoptic_segments({"category": cat, "masks": logits},
                                  confidence=0.5)
    canvas, cats = segs[0]
    assert list(cats) == [1]
    assert (canvas[:3] == 0).all()
    assert (canvas[3:] == VOID).all()    # dropped query leaves void


@pytest.mark.slow
def test_evaluate_pq_end_to_end_smoke():
    """evaluate_pq drives a real DETRPanoptic trainer over mask batches."""
    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.data.datasets import SyntheticShapes

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=5)
    df = ds.dataframes("train")
    model = api.DETRPanoptic(vocab_dict=ds.get_vocab(), num_object_preds=8,
                             image_size=(32, 32), num_encoder_blocks=1,
                             num_encoder_heads=2, encoder_dim=16,
                             num_decoder_blocks=2, num_decoder_heads=2,
                             decoder_dim=16, backbone="tiny",
                             backbone_width=0.25, compute_dtype="float32",
                             max_objects=3, dropout_rate=0.0, mask_size=16)
    pipe = model.make_pipeline(dataset=ds, mask_size=16)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=1e-3, lr_schedule="constant",
        clipnorm=0.0))
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=2)
    r = evaluate_pq(model.trainer, pipe.batches(df, batch_size=4, seed=0))
    assert set(r) >= {"PQ", "SQ", "RQ", "num_categories"}
    assert 0.0 <= r["PQ"] <= 1.0 and 0.0 <= r["SQ"] <= 1.0
    assert 0.0 <= r["RQ"] <= 1.0
