"""Panoptic end-to-end workflow: COCO-format annotations with polygon
segmentation -> mask-target pipeline -> DETRPanoptic training -> standalone
serving artifact.

This is the capability the reference left dark (its PanopticAttention /
PanopticNeck were built but never wired — reference model.py:4,
README.md:97) completed as a user-facing flow. Runs offline: the demo
generates a tiny COCO-format dataset on disk (JPEGs + instances JSON with
polygon/RLE segmentation) exactly like a real COCO download would look.

Usage: python examples/panoptic_workflow.py [--cpu] [--epochs 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np


def make_coco_dataset(root: str, n_images: int = 16, size: int = 64):
    """Write a COCO-layout dataset: images/ + instances.json with polygon
    segmentation (what coco_json_to_dataframe consumes)."""
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        arr = np.full((size, size, 3), 255, np.uint8)
        # one triangle (polygon mask) + one rectangle (bbox-only)
        x, y, w, h = (int(rng.integers(4, 20)), int(rng.integers(4, 20)),
                      int(rng.integers(16, 28)), int(rng.integers(16, 28)))
        tri = np.array([[x, y], [x + w, y], [x, y + h]])
        from PIL import ImageDraw

        im = Image.fromarray(arr)
        ImageDraw.Draw(im).polygon([tuple(p) for p in tri],
                                   fill=(200, 40, 40))
        rx, ry, rw, rh = (int(rng.integers(32, 44)), int(rng.integers(32,
                                                                      44)),
                          12, 10)
        ImageDraw.Draw(im).rectangle([rx, ry, rx + rw, ry + rh],
                                     fill=(40, 40, 200))
        name = f"img_{i}.jpg"
        im.save(os.path.join(img_dir, name), quality=92)
        images.append({"id": i + 1, "file_name": name, "width": size,
                       "height": size})
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 1,
            "bbox": [x, y, w, h], "iscrowd": 0, "area": w * h / 2,
            "segmentation": [[x, y, x + w, y, x, y + h]]})
        ann_id += 1
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 2,
            "bbox": [rx, ry, rw, rh], "iscrowd": 0, "area": rw * rh})
        ann_id += 1
    path = os.path.join(root, "instances.json")
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "triangle"},
                                  {"id": 2, "name": "rectangle"}]}, f)
    return path, img_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--export-dir", default=None)
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from boosted_detr_tpu import api, serving
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.data.datasets import coco_json_to_dataframe

    root = tempfile.mkdtemp(prefix="panoptic_demo_")
    json_path, img_dir = make_coco_dataset(root)
    df = coco_json_to_dataframe(json_path, img_dir)
    print(f"dataset: {len(df)} images, columns {sorted(df.columns)}")

    pano = api.DETRPanoptic(
        vocab_dict={"category": ["triangle", "rectangle"], "attribute": []},
        num_object_preds=8, image_size=(64, 64), num_encoder_blocks=1,
        num_encoder_heads=4, encoder_dim=32, num_decoder_blocks=2,
        num_decoder_heads=4, decoder_dim=32, backbone="tiny",
        backbone_width=0.5, compute_dtype="float32", max_objects=3,
        dropout_rate=0.0, num_panoptic_heads=2, panoptic_dim=32)
    pipe = pano.make_pipeline()  # mask targets rasterized automatically
    sample = next(pipe.batches(df, batch_size=8, seed=0))
    print("batch masks:", sample["masks"].shape)
    pano.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=1e-3, lr_schedule="constant",
        clipnorm=0.0))
    pano.fit(lambda: pipe.batches(df, batch_size=8, seed=0),
             epochs=args.epochs)
    ev = pano.trainer.evaluate(pipe.batches(df, batch_size=8,
                                            shuffle=False))
    print({k: round(float(v), 3) for k, v in ev.items()})
    from boosted_detr_tpu.train import metrics as metrics_lib

    pq = metrics_lib.evaluate_pq(
        pano.trainer, pipe.batches(df, batch_size=8, shuffle=False))
    print("panoptic quality:",
          {k: round(float(v), 3) for k, v in pq.items()})

    export_dir = args.export_dir or os.path.join(root, "serving")
    pano.trainer.export_serving(export_dir)
    served = serving.load_serving(export_dir)
    preds = served(sample["image"], decode_text=False)
    print(f"served masks {preds['masks'].shape} from {export_dir}")


if __name__ == "__main__":
    main()
