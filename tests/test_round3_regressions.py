"""Regression tests for the round-3 VERDICT/ADVICE findings.

Covers: mAP area-range source (VERDICT r2 weak #1), panoptic mask
augmentation (weak #2), grain loader parity (weak #3), hungarian_host
TPU fail-fast (next-round #9), and the pipeline ADVICE findings (multi-host
remainder rotation, too-small dataset error, per-feed iscrowd key).
"""

import numpy as np
import pytest

from boosted_detr_tpu.data import augment, masks as masks_lib
from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.data.pipeline import Pipeline
from boosted_detr_tpu.train import metrics


def _synth_pipe(num_images=10, image_size=32, max_objects=3, seed=0,
                mask_size=None):
    ds = SyntheticShapes(num_images=num_images, image_size=image_size,
                         max_objects=max_objects, seed=seed)
    df = ds.dataframes("train")
    codec = TextCodec(ds.get_vocab())
    pipe = Pipeline((image_size, image_size), max_objects, codec,
                    dataset=ds, mask_size=mask_size)
    return ds, df, pipe


# ---------------------------------------------------------------------------
# pipeline: area / orig_size emission
# ---------------------------------------------------------------------------


def test_pipeline_emits_area_and_orig_size():
    ds, df, pipe = _synth_pipe()
    batch = next(pipe.batches(df, batch_size=4, shuffle=False))
    assert batch["orig_size"].shape == (4, 2)
    assert np.all(batch["orig_size"] == 32)  # synthetic originals are 32x32
    assert batch["area"].shape == (4, 3)
    # fallback areas = normalized w*h * orig pixel count
    for i in range(4):
        n = int(batch["num_objects"][i])
        want = batch["bbox"][i, :n, 2] * batch["bbox"][i, :n, 3] * 32 * 32
        assert np.allclose(batch["area"][i, :n], want, atol=1e-4)
        assert np.all(batch["area"][i, n:] == 0)


def test_pipeline_prefers_annotation_area():
    """COCO rows carry a per-object `area` (segmentation area); the batch
    must use it, not the box w*h."""
    import pandas as pd

    rows = [{
        "id_num": 0, "image_path": "synthetic://train/0",
        "width": 200, "height": 100, "num_boxes": 2,
        "bbox": [[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]],
        "category": [["red"], ["red"]], "attribute": [["<PAD>"], ["<PAD>"]],
        "area": [123.0, None],  # second falls back to box area
    }]
    ds = SyntheticShapes(num_images=1, image_size=32, seed=0)
    ds.dataframes("train")
    pipe = Pipeline((32, 32), 3, TextCodec(ds.get_vocab()), dataset=ds)
    batch = next(pipe.batches(pd.DataFrame(rows), batch_size=1,
                              shuffle=False))
    assert np.allclose(batch["orig_size"][0], [100, 200])
    assert np.isclose(batch["area"][0, 0], 123.0)
    assert np.isclose(batch["area"][0, 1], 0.2 * 0.2 * 200 * 100)


def test_iscrowd_key_decided_per_feed_not_per_batch():
    """ADVICE r2: a dataframe where only SOME rows carry iscrowd must yield
    batches with IDENTICAL key sets (scan_steps stacking requires one pytree
    structure per feed)."""
    import pandas as pd

    mk = lambda i, crowd: {
        "id_num": i, "image_path": "synthetic://train/0",
        "width": 32, "height": 32, "num_boxes": 1,
        "bbox": [[0.1, 0.1, 0.2, 0.2]], "category": [["red"]],
        "attribute": [["<PAD>"]], **({"iscrowd": [1]} if crowd else {}),
    }
    df = pd.DataFrame([mk(0, True), mk(1, False), mk(2, False), mk(3, False)])
    ds = SyntheticShapes(num_images=1, image_size=32, seed=0)
    ds.dataframes("train")
    pipe = Pipeline((32, 32), 2, TextCodec(ds.get_vocab()), dataset=ds)
    keysets = [frozenset(b) for b in pipe.batches(df, batch_size=2,
                                                  shuffle=False)]
    assert len(keysets) == 2
    assert keysets[0] == keysets[1]
    assert "iscrowd" in keysets[0]


# ---------------------------------------------------------------------------
# pipeline: multi-host feed fixes (ADVICE r2)
# ---------------------------------------------------------------------------


def test_multihost_excluded_remainder_rotates_across_epochs():
    """With 10 rows / batch 2 / 2 processes, 8 rows fit per epoch; the
    shared pre-truncation shuffle must rotate WHICH 2 are excluded."""
    ds, df, pipe = _synth_pipe(num_images=10)
    seen_per_epoch = []
    for epoch in range(5):
        ids = []
        counts = []
        for proc in range(2):
            got = list(pipe.batches(df, batch_size=2, shuffle=True, seed=7,
                                    epoch=epoch, process_index=proc,
                                    process_count=2))
            counts.append(len(got))
            ids.extend(int(i) for b in got for i in b["image_id"])
        assert counts[0] == counts[1] == 2  # equal batch counts (collective)
        assert len(ids) == len(set(ids)) == 8  # hosts see disjoint rows
        seen_per_epoch.append(set(ids))
    union = set().union(*seen_per_epoch)
    assert union == set(range(10)), (
        f"rows {set(range(10)) - union} were permanently excluded")


def test_multihost_dataset_smaller_than_global_batch_raises():
    ds, df, pipe = _synth_pipe(num_images=3)
    with pytest.raises(ValueError, match="global batch"):
        next(pipe.batches(df, batch_size=2, process_index=0,
                          process_count=2))


# ---------------------------------------------------------------------------
# mAP: original-image-scale area ranges (VERDICT r2 weak #1)
# ---------------------------------------------------------------------------

# Hand-derived pycocotools fixture: one 100x200 (h, w) original image, one
# class. gt1 20x10px box with annotation area 200 (small); gt2 50x40px box,
# annotation area 2000 (medium). Detections: a 10x5px false positive at
# score .95, then perfect matches of gt1 (.90) and gt2 (.80).
#   all:    order FP,TP,TP -> precision envelope 2/3 everywhere -> mAP 2/3
#   small:  gt1 valid; FP in range first, then TP -> AP .5; det2 ignored
#           (matched to out-of-range gt2)
#   medium: gt2 valid; FP out of range+unmatched -> ignored; det1 ignored
#           (matched to ignored gt1) -> AP 1.0
#   large:  no valid gts -> undefined -> reported -1.0 (pycocotools)
_H, _W = 100, 200
_GT_BOXES_N = np.array([[0.0, 0.0, 0.1, 0.1],      # 20x10 px
                        [0.5, 0.5, 0.25, 0.4]], np.float32)  # 50x40 px
_GT_AREAS = np.array([200.0, 2000.0], np.float32)
_DET_BOXES_N = np.array([[0.0, 0.5, 0.05, 0.05],   # FP, 10x5 px
                         [0.0, 0.0, 0.1, 0.1],
                         [0.5, 0.5, 0.25, 0.4]], np.float32)
_DET_SCORES = np.array([0.95, 0.90, 0.80], np.float32)


def test_area_ranges_use_original_scale_and_annotation_area():
    s = np.array([_W, _H, _W, _H], np.float32)
    preds = [{"boxes": _DET_BOXES_N * s, "scores": _DET_SCORES,
              "labels": np.array([2, 2, 2])}]
    gts = [{"boxes": _GT_BOXES_N * s, "labels": np.array([2, 2]),
            "area": _GT_AREAS}]
    r = metrics.compute_map(preds, gts)
    assert np.isclose(r["mAP"], 2 / 3, atol=1e-6)
    assert np.isclose(r["mAP_small"], 0.5, atol=1e-6)
    assert np.isclose(r["mAP_medium"], 1.0, atol=1e-6)
    assert np.isclose(r["mAP_large"], -1.0, atol=1e-6)  # no large gt
    assert np.isclose(r["AR_small"], 1.0, atol=1e-6)
    assert np.isclose(r["AR_medium"], 1.0, atol=1e-6)


def _fixture_batch_and_predict(with_orig=True):
    """The same fixture flowing through the BATCH + evaluate_map_fn plumbing
    (normalized boxes, model image size 64x64 square)."""
    batch = {
        "image": np.zeros((1, 64, 64, 3), np.float32),
        "bbox": _GT_BOXES_N[None],
        "category_ids": np.array([[2, 2]]),
        "num_objects": np.array([2], np.int32),
    }
    if with_orig:
        batch["orig_size"] = np.array([[_H, _W]], np.int32)
        batch["area"] = _GT_AREAS[None]

    def predict_fn(image):
        cat = np.zeros((1, 3, 3), np.float32)  # [B, P, (PAD, OOV, cls2)]
        cat[0, :, 2] = _DET_SCORES
        return {"category": cat, "boxes": _DET_BOXES_N[None],
                "attribute": np.zeros((1, 3, 1), np.float32)}

    return batch, predict_fn


def test_evaluate_map_fn_plumbs_orig_size_and_area():
    batch, predict_fn = _fixture_batch_and_predict(with_orig=True)
    r = metrics.evaluate_map_fn(predict_fn, [batch], (64, 64))
    assert np.isclose(r["mAP_small"], 0.5, atol=1e-6)
    assert np.isclose(r["mAP_medium"], 1.0, atol=1e-6)
    # without the orig_size/area plumbing the square-resized box areas put
    # BOTH gts in 'small' — the buckets genuinely differ
    batch_old, _ = _fixture_batch_and_predict(with_orig=False)
    r_old = metrics.evaluate_map_fn(predict_fn, [batch_old], (64, 64))
    assert np.isclose(r_old["mAP_small"], 2 / 3, atol=1e-6)
    assert np.isclose(r_old["mAP_medium"], -1.0, atol=1e-6)  # range empty


def test_map_invariant_to_detection_permutation(rng):
    """Randomized invariance: reordering detections (distinct scores) must
    not change any metric (stable sort by score restores the order)."""
    n_img, n_det = 4, 12
    preds, gts = [], []
    # globally distinct scores: score ties are broken by input order in the
    # COCO protocol (stable mergesort), so ties across images are genuinely
    # order-dependent — in pycocotools too
    all_scores = rng.permutation(
        np.linspace(0.1, 0.99, n_img * n_det)).astype(np.float32)
    for i in range(n_img):
        scores = all_scores[i * n_det:(i + 1) * n_det]
        preds.append({
            "boxes": rng.uniform(0, 50, (n_det, 4)).astype(np.float32),
            "scores": scores,
            "labels": rng.integers(2, 5, n_det)})
        n_gt = int(rng.integers(1, 5))
        gts.append({
            "boxes": rng.uniform(0, 50, (n_gt, 4)).astype(np.float32),
            "labels": rng.integers(2, 5, n_gt),
            "area": rng.uniform(10, 10000, n_gt).astype(np.float32)})
    base = metrics.compute_map(preds, gts)
    perm_preds = []
    for p in preds:
        order = rng.permutation(len(p["scores"]))
        perm_preds.append({k: v[order] for k, v in p.items()})
    permuted = metrics.compute_map(perm_preds, gts)
    for k in base:
        if k == "per_class":
            continue
        assert np.isclose(base[k], permuted[k], atol=1e-9), k
    image_order = rng.permutation(n_img)
    shuffled = metrics.compute_map([preds[i] for i in image_order],
                                   [gts[i] for i in image_order])
    for k in base:
        if k == "per_class":
            continue
        assert np.isclose(base[k], shuffled[k], atol=1e-9), k


# ---------------------------------------------------------------------------
# augmentation: panoptic masks warped with image/boxes (VERDICT r2 weak #2)
# ---------------------------------------------------------------------------


def test_augment_warps_masks_consistently_with_boxes():
    import jax

    S = 64
    boxes = np.array([[0.1, 0.2, 0.5, 0.4], [0.4, 0.5, 0.4, 0.35]],
                     np.float32)
    masks = np.stack([masks_lib.box_to_mask(b, S) for b in boxes])
    batch = {"image": np.random.default_rng(0).uniform(
                 0, 1, (1, 64, 64, 3)).astype(np.float32),
             "bbox": boxes[None], "masks": masks[None],
             "num_objects": np.array([2], np.int32)}
    def iou(a, b):
        a, b = a >= 0.5, b >= 0.5
        inter = float(np.sum(a & b))
        union = float(np.sum(a | b))
        return inter / max(union, 1.0)

    fn = jax.jit(augment.augment_batch)
    moved = 0  # keys where the affine actually displaced the boxes
    for key in range(16):
        aug = fn(jax.random.PRNGKey(key), batch)
        new_boxes = np.asarray(aug["bbox"][0])
        new_masks = np.asarray(aug["masks"][0])
        assert new_masks.shape == masks.shape
        for j in range(2):
            expect = masks_lib.box_to_mask(new_boxes[j], S)
            warped_iou = iou(new_masks[j], expect)
            stale_iou = iou(masks[j], expect)
            assert warped_iou > 0.75, (key, j, warped_iou)
            if stale_iou < 0.8:  # a real shift: stale masks would misalign
                moved += 1
                assert warped_iou > stale_iou, (key, j, warped_iou,
                                                stale_iou)
    assert moved >= 3, "augmentation never displaced the boxes — weak test"


# ---------------------------------------------------------------------------
# grain loader parity (VERDICT r2 weak #3) + panoptic fit via grain
# ---------------------------------------------------------------------------


def test_grain_source_emits_masks_iscrowd_area():
    pytest.importorskip("grain")
    import pandas as pd

    from boosted_detr_tpu.data.grain_loader import make_grain_loader

    ds, df, pipe = _synth_pipe(num_images=4, mask_size=8)
    df = pd.DataFrame([{**r, "iscrowd": [0] * r["num_boxes"]}
                       for r in df.to_dict("records")])
    batch = next(make_grain_loader(df, pipe, batch_size=2, shuffle=False))
    assert batch["masks"].shape == (2, 3, 8, 8)
    assert batch["iscrowd"].shape == (2, 3)
    assert batch["area"].shape == (2, 3)
    assert batch["orig_size"].shape == (2, 2)
    # content parity with the built-in feeder
    ref = next(pipe.batches(df, batch_size=2, shuffle=False))
    assert np.allclose(batch["masks"], ref["masks"])
    assert np.allclose(batch["bbox"], ref["bbox"])


@pytest.mark.slow
def test_panoptic_fit_runs_off_grain_loader():
    pytest.importorskip("grain")
    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.data.grain_loader import make_grain_loader

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=5)
    df = ds.dataframes("train")
    pano = api.DETRPanoptic(
        vocab_dict=ds.get_vocab(), num_object_preds=6, image_size=(32, 32),
        num_encoder_blocks=1, num_encoder_heads=2, encoder_dim=16,
        num_decoder_blocks=2, num_decoder_heads=2, decoder_dim=16,
        backbone="tiny", backbone_width=0.25, compute_dtype="float32",
        max_objects=3, dropout_rate=0.0, num_panoptic_heads=2,
        panoptic_dim=16)
    pipe = pano.make_pipeline(dataset=ds)  # masks at the module's mask_size
    sample = next(make_grain_loader(df, pipe, batch_size=4, shuffle=False))
    assert "masks" in sample
    pano.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=2e-3, lr_schedule="constant",
        clipnorm=0.0))
    hist = pano.fit(
        lambda: make_grain_loader(df, pipe, batch_size=4, seed=0), epochs=3)
    assert np.isfinite(hist["loss"][-1])
    assert hist["loss"][-1] < hist["loss"][0]


# ---------------------------------------------------------------------------
# norm-free backbone (skipinit): the 80px-BN-roofline design-out candidate
# ---------------------------------------------------------------------------


def test_skipinit_backbone_trains_without_batch_stats():
    """norm='skipinit' (weight-standardized convs + zero-init residual
    gains) must train end-to-end with NO batch_stats collection and learn."""
    import jax

    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=1)
    df = ds.dataframes("train")
    model = api.DETR(vocab_dict=ds.get_vocab(), num_object_preds=8,
                     image_size=(32, 32), num_encoder_blocks=1,
                     num_encoder_heads=2, encoder_dim=16,
                     num_decoder_blocks=2, num_decoder_heads=2,
                     decoder_dim=16, backbone="resnet", backbone_width=0.25,
                     compute_dtype="float32", max_objects=3,
                     dropout_rate=0.0, norm="skipinit", stem="patchify8")
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           learning_rate=1e-3,
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    params = model.trainer.state.params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    assert any("skip_gain" in p for p in paths)
    assert any("gain" in p and "resnet" in p for p in paths)  # WS conv gains
    # the resnet subtree must carry NO BatchNorm running stats
    stats = model.trainer.state.batch_stats
    assert "resnet" not in jax.tree_util.tree_map(lambda x: x, stats) or \
        not stats.get("resnet"), stats.keys() if hasattr(stats, "keys") \
        else stats
    hist = model.fit(lambda: pipe.batches(df, batch_size=4, seed=0),
                     epochs=4)
    assert np.isfinite(hist["loss"][-1])
    assert hist["loss"][-1] < hist["loss"][0]


def test_agc_masked_off_scalars():
    """NFNet adaptive gradient clipping must NOT apply to sub-matrix params:
    on skipinit's ZERO-init skip_gain scalars an unmasked ratio clip caps the
    update at ~eps*clip forever, freezing every residual branch shut (the
    measured skipinit_agc val collapse, benchmarks/RESULTS.md)."""
    import jax.numpy as jnp

    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.train import steps

    params = {"kernel": jnp.ones((3, 3)), "skip_gain": jnp.zeros(())}
    tx = steps.make_optimizer(TrainConfig(
        optimizer="adamw", learning_rate=1e-2, lr_schedule="constant",
        clipnorm=0.0, agc_clip=0.05))
    state = tx.init(params)
    grads = {"kernel": jnp.full((3, 3), 10.0), "skip_gain": jnp.asarray(5.0)}
    updates, _ = tx.update(grads, state, params)
    # kernel IS ratio-clipped (||update|| ~= lr * clip * ||w|| territory)
    assert float(jnp.linalg.norm(updates["kernel"])) < 0.05
    # the zero-init scalar still takes a full adamw step
    assert abs(float(updates["skip_gain"])) > 5e-3


# ---------------------------------------------------------------------------
# hungarian_host: clear TPU fail-fast (VERDICT r2 next-round #9)
# ---------------------------------------------------------------------------


def test_hungarian_host_fails_fast_on_tpu(monkeypatch):
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.ops import matching

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cost = jnp.zeros((2, 3, 4))
    n = jnp.array([3, 2], jnp.int32)
    with pytest.raises(ValueError, match="CPU-only"):
        matching.solve_matching(cost, n, method="hungarian_host")


# ---------------------------------------------------------------------------
# round-3 self-review fixes: ragged val batches reach the evaluator, and
# every driver tolerates a model with NO batch_stats collection (skipinit)
# ---------------------------------------------------------------------------


def test_val_split_smaller_than_batch_still_evaluates():
    """cli --eval-map protocol: a 5-image val split with batch_size=8 must
    produce one ragged batch (drop_remainder=False) and the evaluator must
    see all 5 images — previously zero batches were yielded and mAP printed
    as 0.0 regardless of model quality."""
    ds, df, pipe = _synth_pipe(num_images=5)
    batches = list(pipe.batches(df, batch_size=8, shuffle=False,
                                drop_remainder=False))
    assert len(batches) == 1 and batches[0]["image"].shape[0] == 5

    gt_records = metrics.batch_to_ground_truth(batches[0])
    assert len(gt_records) == 5  # every val image reaches the evaluator


@pytest.mark.slow
def test_val_suite_driver_runs_skipinit_variant():
    """The val-suite driver (and, by the same .get('batch_stats', {})
    pattern, bench/profile/flagship drivers) must run a norm-free model:
    jax.jit(model.init) on norm='skipinit' returns NO batch_stats
    collection, and variables["batch_stats"] used to KeyError."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/train_val_suite.py", "--cpu", "--quick",
         "--variant", "skipinit"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "VAL_SUITE" in out.stdout


# ---------------------------------------------------------------------------
# Folded multi-block matching (one lane-batched solve for L blocks)
# ---------------------------------------------------------------------------


def test_folded_intermediate_matching_parity():
    """compute_losses(fold=True) folds L blocks into one [L*B] matcher call;
    it must agree with the sequential per-block loop (and its gradients)."""
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.config import LossWeights, ModelConfig
    from boosted_detr_tpu.train import steps

    rng = np.random.default_rng(0)
    B, O, P, Vc, Va, L = 3, 5, 9, 7, 6, 4
    batch = {
        "bbox": rng.uniform(0.05, 0.4, (B, O, 4)).astype(np.float32),
        "category_ids": rng.integers(2, Vc, (B, O)),
        "attribute_ids": rng.integers(0, Va, (B, O, 2)),
        "num_objects": np.array([2, 0, 5], np.int32),
    }
    cfg = ModelConfig(num_categories=Vc, num_attributes=Va,
                      matcher="hungarian")

    def make_preds(key):
        k1, k2, k3 = jax.random.split(key, 3)
        cat = jax.nn.softmax(jax.random.normal(k1, (B, P, Vc)), axis=-1)
        att = jax.nn.sigmoid(jax.random.normal(k2, (B, P, Va)))
        box = jax.random.uniform(k3, (B, P, 4), minval=0.05, maxval=0.4)
        return {"category": cat, "attribute": att, "boxes": box}

    preds_list = [make_preds(jax.random.PRNGKey(i)) for i in range(L)]

    loss_seq, aux_seq = steps.compute_losses(preds_list, batch, cfg,
                                             LossWeights(), fold=False)
    loss_fold, aux_fold = steps.compute_losses(preds_list, batch, cfg,
                                               LossWeights(), fold=True)
    assert np.isclose(float(loss_seq), float(loss_fold), rtol=1e-5)
    for k in aux_seq:
        assert np.isclose(float(aux_seq[k]), float(aux_fold[k]),
                          rtol=1e-5, atol=1e-6), (k, aux_seq[k], aux_fold[k])

    # gradient parity through the fold (matcher is stop-gradient in both)
    def scalar(fold):
        def f(boxes0):
            pl = [dict(p) for p in preds_list]
            pl[0] = dict(pl[0], boxes=boxes0)
            return steps.compute_losses(pl, batch, cfg, LossWeights(),
                                        fold=fold)[0]
        return jax.grad(f)(preds_list[0]["boxes"])

    g_seq, g_fold = scalar(False), scalar(True)
    assert np.allclose(np.asarray(g_seq), np.asarray(g_fold),
                       rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# parameter EMA (TrainConfig.ema_decay): on-device shadow + eval/predict hook
# ---------------------------------------------------------------------------


def _tiny_detr_api(ds, ema_decay=0.0, checkpoint_dir=None):
    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig

    model = api.DETR(vocab_dict=ds.get_vocab(), num_object_preds=8,
                     image_size=(32, 32), num_encoder_blocks=1,
                     num_encoder_heads=2, encoder_dim=16,
                     num_decoder_blocks=2, num_decoder_heads=2,
                     decoder_dim=16, backbone="tiny", backbone_width=0.25,
                     compute_dtype="float32", max_objects=3,
                     dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)
    df = ds.dataframes("train")
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=1e-3, lr_schedule="constant",
        clipnorm=0.0, ema_decay=ema_decay, checkpoint_dir=checkpoint_dir))
    return model, pipe, df, sample


def test_ema_shadow_math_exact():
    """ema_{t} = d*ema_{t-1} + (1-d)*params_t, initialized at the init
    params — verified leaf-exactly over two real train steps."""
    import jax
    import jax.numpy as jnp

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=3)
    model, pipe, df, sample = _tiny_detr_api(ds, ema_decay=0.9)
    tr = model.trainer
    assert tr.state.ema_params is not None
    p0 = jax.tree.map(np.asarray, tr.state.params)
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.tree.map(np.asarray, tr.state.ema_params))[0],
        jax.tree.leaves(p0)[0])

    batch = {k: jnp.asarray(v) for k, v in sample.items()
             if k in tr.BATCH_KEYS}
    rng = jax.random.PRNGKey(0)
    state = tr.state
    ema = p0
    for _ in range(2):
        state, _ = tr._train_step(state, batch, rng)
        p = jax.tree.map(np.asarray, state.params)
        ema = jax.tree.map(lambda e, q: 0.9 * e + 0.1 * q, ema, p)
    got = jax.tree.map(np.asarray, state.ema_params)
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    # and the shadow genuinely lags the live params
    diffs = [float(np.max(np.abs(a - b))) for a, b in zip(
        jax.tree.leaves(got),
        jax.tree.leaves(jax.tree.map(np.asarray, state.params)))]
    assert max(diffs) > 0


def test_trainer_use_ema_eval_predict_checkpoint(tmp_path):
    """evaluate/predict(use_ema=True) read the shadow; checkpoints carry it;
    with_ema_params fails fast when EMA is off."""
    from boosted_detr_tpu.train import steps as steps_lib

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=4)
    model, pipe, df, sample = _tiny_detr_api(
        ds, ema_decay=0.5, checkpoint_dir=str(tmp_path / "ck"))
    tr = model.trainer
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=2)

    m_raw = tr.evaluate([sample])
    m_ema = tr.evaluate([sample], use_ema=True)
    assert np.isfinite(m_raw["loss"]) and np.isfinite(m_ema["loss"])
    assert m_raw["loss"] != m_ema["loss"]  # different weights, tiny model
    preds = tr.predict(sample["image"], decode_text=False, use_ema=True)
    assert np.isfinite(preds["boxes"]).all()

    # checkpoint round trip preserves the shadow
    import jax
    tr.save(step=1, wait=True)
    want = jax.tree.map(np.asarray, tr.state.ema_params)
    model2, _, _, _ = _tiny_detr_api(
        ds, ema_decay=0.5, checkpoint_dir=str(tmp_path / "ck"))
    assert model2.trainer.restore()
    got = jax.tree.map(np.asarray, model2.trainer.state.ema_params)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)

    # EMA off -> structural None and a clear error on use_ema
    model3, _, _, _ = _tiny_detr_api(ds, ema_decay=0.0)
    assert model3.trainer.state.ema_params is None
    with pytest.raises(ValueError, match="EMA"):
        steps_lib.with_ema_params(model3.trainer.state)


def test_ema_save_load_model_and_serving_export(tmp_path):
    """The whole-model save path carries the EMA shadow: load_model()
    rebuilds an EMA-enabled state with the saved shadow restored, and
    export_serving(use_ema=True) bakes the shadow (not the live params)
    into the artifact."""
    import jax

    from boosted_detr_tpu import api, serving

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=5)
    model, pipe, df, sample = _tiny_detr_api(ds, ema_decay=0.5)
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)
    tr = model.trainer

    model.save(str(tmp_path / "m"))
    m2 = api.load_model(str(tmp_path / "m"))
    assert m2.trainer.state.ema_params is not None
    want = jax.tree.leaves(jax.tree.map(np.asarray, tr.state.ema_params))
    got = jax.tree.leaves(
        jax.tree.map(np.asarray, m2.trainer.state.ema_params))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)

    # EMA-weight export == predict(use_ema=True), != raw-weight export
    serving.export_serving(tr, str(tmp_path / "art"), platforms=("cpu",),
                           use_ema=True)
    served = serving.load_serving(str(tmp_path / "art"))
    assert served.meta["ema_weights"] is True
    images = sample["image"].astype(np.float32)
    out = served(images, decode_text=False)
    ref = tr.predict(images, decode_text=False, use_ema=True)
    np.testing.assert_allclose(out["boxes"], ref["boxes"],
                               rtol=1e-5, atol=1e-6)
    raw = tr.predict(images, decode_text=False)
    assert float(np.max(np.abs(raw["boxes"] - ref["boxes"]))) > 0


def test_ema_state_loads_pre_ema_weights(tmp_path):
    """A weights checkpoint saved WITHOUT EMA loads into an EMA-enabled
    trainer: params restore, the shadow re-seeds from the restored params
    (and the reverse direction simply drops the shadow)."""
    import jax

    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=6)
    plain, pipe, df, sample = _tiny_detr_api(ds, ema_decay=0.0)
    plain.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)
    plain.trainer.save_weights(str(tmp_path / "w"))

    withema, _, _, _ = _tiny_detr_api(ds, ema_decay=0.5)
    withema.trainer.load_weights(str(tmp_path / "w"))
    p = jax.tree.leaves(
        jax.tree.map(np.asarray, withema.trainer.state.params))
    e = jax.tree.leaves(
        jax.tree.map(np.asarray, withema.trainer.state.ema_params))
    for a, b in zip(p, e):
        np.testing.assert_array_equal(a, b)
    want = jax.tree.leaves(
        jax.tree.map(np.asarray, plain.trainer.state.params))
    for a, b in zip(want, p):
        np.testing.assert_array_equal(a, b)

    # reverse: EMA checkpoint into an EMA-less trainer drops the shadow
    withema.trainer.save_weights(str(tmp_path / "w2"))
    plain2, _, _, _ = _tiny_detr_api(ds, ema_decay=0.0)
    plain2.trainer.load_weights(str(tmp_path / "w2"))
    assert plain2.trainer.state.ema_params is None

    # same cross-compatibility on the CheckpointManager resume path
    plain3, _, _, _ = _tiny_detr_api(
        ds, ema_decay=0.0, checkpoint_dir=str(tmp_path / "ck"))
    plain3.trainer.save(step=1, wait=True)
    resumed, _, _, _ = _tiny_detr_api(
        ds, ema_decay=0.5, checkpoint_dir=str(tmp_path / "ck"))
    assert resumed.trainer.restore()  # pre-EMA ckpt -> shadow seeds
    a = jax.tree.leaves(
        jax.tree.map(np.asarray, resumed.trainer.state.ema_params))
    b = jax.tree.leaves(
        jax.tree.map(np.asarray, resumed.trainer.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    resumed.trainer.save(step=2, wait=True)
    back, _, _, _ = _tiny_detr_api(
        ds, ema_decay=0.0, checkpoint_dir=str(tmp_path / "ck"))
    assert back.trainer.restore()  # EMA ckpt -> EMA-less state: dropped
    assert back.trainer.state.ema_params is None


def test_intermediate_loss_avg_is_sum_over_blocks():
    """TrainConfig.intermediate_loss_avg: mean-over-blocks aux supervision
    reports exactly (summed loss)/L from the same state — the single-block
    gradient scale that composes with an lr tuned without aux losses
    (benchmarks/RESULTS.md: summed aux losses push lr 1e-4 past the
    val-suite protocol's divergence point)."""
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps

    rng = np.random.default_rng(3)
    B, O = 2, 4
    cfg = ModelConfig(image_size=(32, 32), backbone="tiny",
                      backbone_width=0.25, max_objects=O,
                      num_categories=7, num_attributes=5,
                      num_encoder_blocks=1, num_decoder_blocks=3,
                      encoder_dim=32, decoder_dim=32,
                      num_encoder_heads=2, num_decoder_heads=2,
                      num_object_preds=6, matcher="hungarian",
                      dropout_rate=0.0)
    model = DETR(cfg)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)), jnp.float32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (B, O, 4)), jnp.float32),
        "num_objects": jnp.asarray([2, 1], jnp.int32),
        "category_ids": jnp.asarray(rng.integers(1, 6, (B, O)), jnp.int32),
        "attribute_ids": jnp.zeros((B, O, 1), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", learning_rate=1e-4,
                       lr_schedule="constant", use_intermediate_losses=True)
    auxes = {}
    for avg in (False, True):
        step = steps.make_train_step(
            model, cfg, tcfg.replace(intermediate_loss_avg=avg))
        state = steps.TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
        _, aux = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        auxes[avg] = aux
    L = cfg.num_decoder_blocks
    assert np.isclose(float(auxes[True]["loss"]),
                      float(auxes[False]["loss"]) / L, rtol=1e-6)
    assert np.isclose(float(auxes[True]["loss_total"]),
                      float(auxes[False]["loss_total"]) / L, rtol=1e-6)
    # metrics (iou) are not losses and must NOT be scaled
    assert np.isclose(float(auxes[True]["iou"]),
                      float(auxes[False]["iou"]), rtol=1e-6)
