"""COCO segmentation ETL: polygon/RLE rasterization + pipeline mask targets
(VERDICT round-1 missing #2)."""

import json
import os

import numpy as np
import pytest

from boosted_detr_tpu.data import masks as M
from boosted_detr_tpu.data.datasets import coco_json_to_dataframe
from boosted_detr_tpu.data.pipeline import Pipeline
from boosted_detr_tpu.data.codec import TextCodec


def test_rasterize_polygon_square():
    # axis-aligned square [0.25, 0.75)^2 at 16px: exactly the middle 8x8
    ring = [0.25, 0.25, 0.75, 0.25, 0.75, 0.75, 0.25, 0.75]
    m = M.rasterize_polygons([ring], 16)
    expect = np.zeros((16, 16), np.float32)
    expect[4:12, 4:12] = 1.0
    assert np.array_equal(m, expect)


def test_rasterize_polygon_triangle_matches_halfplane():
    # right triangle (0,0)-(1,0)-(0,1): pixel centers with x+y<1 are inside
    ring = [0.0, 0.0, 1.0, 0.0, 0.0, 1.0]
    s = 32
    m = M.rasterize_polygons([ring], s)
    c = (np.arange(s) + 0.5) / s
    total = c[:, None] + c[None, :]
    # pixel centers EXACTLY on the hypotenuse are a tie-break convention;
    # everything strictly inside/outside must match the half-plane
    assert (m[total < 1.0 - 1e-9] == 1.0).all()
    assert (m[total > 1.0 + 1e-9] == 0.0).all()


def test_rasterize_multi_ring_union():
    r1 = [0.0, 0.0, 0.25, 0.0, 0.25, 0.25, 0.0, 0.25]
    r2 = [0.75, 0.75, 1.0, 0.75, 1.0, 1.0, 0.75, 1.0]
    m = M.rasterize_polygons([r1, r2], 8)
    assert m[0, 0] == 1.0 and m[7, 7] == 1.0
    assert m[4, 4] == 0.0
    assert m.sum() == 8  # two 2x2 corners


def test_uncompressed_rle_roundtrip():
    # hand-built 3x4 mask, column-major runs
    target = np.array([[0, 1, 1, 0],
                       [0, 1, 0, 0],
                       [1, 1, 0, 0]], np.float32)
    flat = target.T.reshape(-1)  # column-major
    counts, run, val = [], 0, 0
    for v in flat:
        if int(v) == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, int(v)
    counts.append(run)
    got = M.decode_rle({"size": [3, 4], "counts": counts})
    assert np.array_equal(got, target)


def test_compressed_rle_matches_uncompressed():
    # encode counts with the COCO ASCII scheme, decode, compare
    rng = np.random.default_rng(0)
    target = (rng.uniform(size=(13, 7)) > 0.5).astype(np.float32)
    flat = target.T.reshape(-1)
    counts, run, val = [], 0, 0
    for v in flat:
        if int(v) == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, int(v)
    counts.append(run)

    def encode(counts):  # inverse of masks._decode_rle_counts
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)
                            or x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    rle = {"size": list(target.shape), "counts": encode(list(counts))}
    got = M.decode_rle(rle)
    assert np.array_equal(got, target)


def test_resize_mask_preserves_binary():
    m = np.zeros((10, 10), np.float32)
    m[2:8, 3:9] = 1.0
    r = M.resize_mask(m, 5)
    assert set(np.unique(r)) <= {0.0, 1.0}
    assert r.shape == (5, 5)
    assert r[2, 2] == 1.0 and r[0, 0] == 0.0


def _write_coco_fixture(tmp_path, n_images=4, size=64):
    """A tiny COCO-format dataset: JPEG images + polygon/RLE/keypoint
    annotations."""
    from PIL import Image

    img_dir = tmp_path / "images"
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    rng = np.random.default_rng(7)
    ann_id = 1
    for i in range(n_images):
        arr = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=90)
        images.append({"id": i + 1, "file_name": name,
                       "width": size, "height": size})
        # one polygon (triangle inside its box) + one bbox-only object
        x, y, w, h = 8, 8, 24, 24
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 1,
            "bbox": [x, y, w, h], "iscrowd": 0, "area": w * h / 2,
            "segmentation": [[x, y, x + w, y, x, y + h]],
            "keypoints": [x + 2, y + 2, 2, 0, 0, 0],
            "num_keypoints": 1,
            # DensePose pass-through columns (reference datasets.py:484-493)
            "dp_I": [1.0, 2.0], "dp_U": [0.1, 0.2],
        })
        ann_id += 1
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 2,
            "bbox": [36, 36, 16, 12], "iscrowd": 0, "area": 16 * 12,
        })
        ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "triangle"},
                       {"id": 2, "name": "box"}],
    }
    json_path = tmp_path / "instances.json"
    with open(json_path, "w") as f:
        json.dump(coco, f)
    return str(json_path), str(img_dir)


def test_coco_dataframe_optional_columns(tmp_path):
    json_path, img_dir = _write_coco_fixture(tmp_path)
    df = coco_json_to_dataframe(json_path, img_dir)
    assert {"segmentation", "iscrowd", "keypoints",
            "num_keypoints", "area", "dp_I", "dp_U"} <= set(df.columns)
    # pass-through columns absent from every annotation are not emitted
    assert "dp_masks" not in df.columns and "segments_info" not in df.columns
    row = df.iloc[0]
    assert row["num_boxes"] == 2
    # raw pixel areas (reference keeps them un-normalized, datasets.py:431)
    assert row["area"] == [24 * 24 / 2, 16 * 12]
    assert row["dp_I"] == [[1.0, 2.0], None]
    assert row["dp_U"] == [[0.1, 0.2], None]
    # polygon normalized to [0, 1]
    ring = row["segmentation"][0][0]
    assert max(ring) <= 1.0 and min(ring) >= 0.0
    assert row["segmentation"][1] is None  # bbox-only object
    assert row["iscrowd"] == [0, 0]
    assert row["num_keypoints"] == [1, 0]
    kx, ky, kv = row["keypoints"][0][:3]
    assert 0 < kx < 1 and 0 < ky < 1 and kv == 2


def test_captions_merge(tmp_path):
    json_path, img_dir = _write_coco_fixture(tmp_path, n_images=2)
    cap_path = tmp_path / "captions.json"
    with open(cap_path, "w") as f:
        json.dump({"annotations": [
            {"image_id": 1, "caption": "a triangle and a box"},
            {"image_id": 1, "caption": "two shapes"},
        ]}, f)
    df = coco_json_to_dataframe(json_path, img_dir,
                                captions_json_path=str(cap_path))
    assert list(df[df.id_num == 1]["caption"])[0] == [
        "a triangle and a box", "two shapes"]
    assert list(df[df.id_num == 2]["caption"])[0] == []


def test_pipeline_produces_polygon_masks(tmp_path):
    json_path, img_dir = _write_coco_fixture(tmp_path)
    df = coco_json_to_dataframe(json_path, img_dir)
    codec = TextCodec({"category": ["triangle", "box"], "attribute": []})
    pipe = Pipeline((64, 64), max_objects=3, codec=codec, mask_size=32)
    batch = next(pipe.batches(df, batch_size=4, shuffle=False))
    assert batch["masks"].shape == (4, 3, 32, 32)
    tri, box, pad = batch["masks"][0, 0], batch["masks"][0, 1], \
        batch["masks"][0, 2]
    # triangle mask is roughly half its bounding box's filled area
    box_mask = M.box_to_mask(batch["bbox"][0, 0], 32)
    assert 0.3 < tri.sum() / box_mask.sum() < 0.7
    assert (tri <= box_mask + 1e-6).all()  # polygon inside its box
    # bbox-only object falls back to the filled box
    assert np.array_equal(box, M.box_to_mask(batch["bbox"][0, 1], 32))
    assert pad.sum() == 0  # padded slot empty


@pytest.mark.slow
def test_panoptic_trains_on_real_polygon_masks(tmp_path):
    """End-to-end: COCO polygon fixture -> pipeline masks -> DETRPanoptic
    training reduces the mask loss (VERDICT round-1 item 4)."""
    import jax

    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig

    json_path, img_dir = _write_coco_fixture(tmp_path)
    df = coco_json_to_dataframe(json_path, img_dir)
    pano = api.DETRPanoptic(
        vocab_dict={"category": ["triangle", "box"], "attribute": []},
        num_object_preds=6, image_size=(64, 64), num_encoder_blocks=1,
        num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
        num_decoder_heads=2, decoder_dim=16, backbone="tiny",
        backbone_width=0.25, compute_dtype="float32", max_objects=3,
        dropout_rate=0.0)
    pipe = pano.make_pipeline()
    assert pipe.mask_size == pano.module.mask_size
    sample = next(pipe.batches(df, batch_size=4, shuffle=False))
    assert "masks" in sample
    pano.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=2e-3, lr_schedule="constant",
        clipnorm=0.0))
    before = pano.trainer.evaluate(pipe.batches(df, batch_size=4,
                                                shuffle=False))
    pano.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=10)
    after = pano.trainer.evaluate(pipe.batches(df, batch_size=4,
                                               shuffle=False))
    assert after["loss_mask"] < before["loss_mask"]
