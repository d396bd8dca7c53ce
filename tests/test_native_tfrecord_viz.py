"""Native C++ LAP solver, TFRecord round trip, and visualization tests."""

import io
import os

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment


def test_native_lap_matches_scipy(rng):
    from boosted_detr_tpu.native import lap_binding

    for (b, o, p) in [(4, 8, 16), (2, 32, 96), (3, 1, 5)]:
        cost = rng.uniform(-5, 10, size=(b, o, p)).astype(np.float32)
        n = rng.integers(0, o + 1, size=(b,)).astype(np.int32)
        mask = lap_binding.lap_solve_batch(cost, n)
        for i in range(b):
            ni = int(n[i])
            assert np.allclose(mask[i, ni:], 0.0)
            if ni:
                assert np.allclose(mask[i, :ni].sum(1), 1.0)
                r, c = linear_sum_assignment(cost[i, :ni, :])
                assert np.isclose((mask[i] * cost[i]).sum(),
                                  cost[i][r, c].sum(), rtol=1e-5, atol=1e-4)


def test_native_lap_total_cost(rng):
    from boosted_detr_tpu.native import lap_binding

    cost = rng.uniform(0, 1, size=(2, 5, 9)).astype(np.float32)
    n = np.array([5, 3], np.int32)
    total = lap_binding.lap_total_cost(cost, n)
    expected = sum(
        cost[i][linear_sum_assignment(cost[i, :int(n[i]), :])].sum()
        for i in range(2))
    assert np.isclose(total, expected, rtol=1e-5)


def test_tfrecord_roundtrip(tmp_path):
    from boosted_detr_tpu.data import tfrecord
    from boosted_detr_tpu.data.datasets import SyntheticShapes

    ds = SyntheticShapes(num_images=5, image_size=32, max_objects=2, seed=2)
    df = ds.dataframes("train")

    def loader(row):
        import cv2

        img = ds.render(int(row["id_num"]))
        ok, enc = cv2.imencode(".png", (img * 255).astype(np.uint8))
        return enc.tobytes()

    paths = tfrecord.write_tfrecords(df, loader, str(tmp_path),
                                     files_per_shard=2)
    assert len(paths) == tfrecord.num_shards_needed(5, 2) == 3
    records = list(tfrecord.read_tfrecords(paths))
    assert len(records) == 5
    rec = {r["image_id"]: r for r in records}
    for _, row in df.iterrows():
        r = rec[int(row["id_num"])]
        assert r["num_objects"] == int(row["num_boxes"])
        assert np.allclose(r["bbox"], np.asarray(row["bbox"], np.float32),
                           atol=1e-6)
        assert list(r["category"]) == [c[0] for c in row["category"]]
        # image decodes back to the original pixels
        import cv2

        img = cv2.imdecode(np.frombuffer(r["image_bytes"], np.uint8),
                           cv2.IMREAD_COLOR)
        assert img.shape == (32, 32, 3)


def test_visualize_smoke(tmp_path, rng):
    import matplotlib

    matplotlib.use("Agg")
    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.utils import visualize

    codec = TextCodec({"category": ["cat", "dog"], "attribute": ["x"]})
    image = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    batch = {"num_objects": np.array([1]),
             "bbox": np.array([[[0.1, 0.1, 0.4, 0.4]]], np.float32),
             "category_ids": np.array([[2]], np.int32)}
    out = str(tmp_path / "gt.png")
    visualize.show_example(image, batch, 0, codec, save_path=out)
    assert os.path.getsize(out) > 0

    out2 = str(tmp_path / "pred.png")
    visualize.show_prediction(
        image, ["dog", "<PAD>"], ["x", ""],
        np.array([[0.2, 0.2, 0.3, 0.3], [0.0, 0.0, 0.1, 0.1]]),
        save_path=out2)
    assert os.path.getsize(out2) > 0


def test_native_jpeg_loader(tmp_path, rng):
    from PIL import Image

    from boosted_detr_tpu.native import imgload_binding

    paths = []
    originals = []
    for i in range(3):
        arr = rng.uniform(0, 255, (40 + i * 8, 60, 3)).astype(np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
        originals.append(arr)
    images, ok = imgload_binding.load_jpeg_batch(paths, (32, 48))
    assert ok.all()
    assert images.shape == (3, 32, 48, 3)
    assert images.dtype == np.float32
    assert 0.0 <= images.min() and images.max() <= 1.0
    # content sanity: mean brightness tracks the original
    for i in range(3):
        assert abs(images[i].mean() - originals[i].mean() / 255.0) < 0.05

    # failure path: non-jpeg reports not-ok
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"not a jpeg")
    images, ok = imgload_binding.load_jpeg_batch([bad], (16, 16))
    assert not ok[0]
    assert np.allclose(images[0], 0.0)


def test_pipeline_uses_native_jpeg_path(tmp_path, rng):
    from PIL import Image

    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.pipeline import Pipeline
    import pandas as pd

    rows = []
    for i in range(4):
        arr = rng.uniform(0, 255, (50, 50, 3)).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(arr).save(p)
        rows.append({"id_num": i, "image_path": p, "width": 50, "height": 50,
                     "num_boxes": 1, "bbox": [[0.1, 0.1, 0.5, 0.5]],
                     "category": [["cat"]], "attribute": [["x"]]})
    df = pd.DataFrame(rows)
    codec = TextCodec({"category": ["cat"], "attribute": ["x"]})
    pipe = Pipeline((32, 32), max_objects=2, codec=codec)
    b = next(pipe.batches(df, batch_size=4, shuffle=False))
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["image"].max() <= 1.0 and b["image"].min() >= 0.0
