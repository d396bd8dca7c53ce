"""End-to-end demo: train DETR on the synthetic-shapes dataset and evaluate
COCO mAP — the minimum full-pipeline exercise (data -> codec -> pipeline ->
trainer -> matcher -> mAP -> text decoding), runnable anywhere (CPU or TPU).

Usage: python scripts/train_synthetic.py [--epochs 30] [--tpu]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--images", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (default uses the available backend)")
    parser.add_argument("--backbone", default="tiny",
                        help="backbone spec (tiny | resnet | "
                             "efficientnet_lite | vit[_pP_dD_wW_hH])")
    parser.add_argument("--stem", default="conv7",
                        help="resnet stem: conv7 | patchify | patchify8")
    parser.add_argument("--backbone-width", type=float, default=1.0)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.data.datasets import SyntheticShapes
    from boosted_detr_tpu.train import metrics as metrics_lib

    ds = SyntheticShapes(num_images=args.images, image_size=64,
                         max_objects=3, seed=0)
    df = ds.dataframes("train")
    model = api.DETR(
        vocab_dict=ds.get_vocab(), num_object_preds=12, image_size=(64, 64),
        num_encoder_blocks=2, num_encoder_heads=4, encoder_dim=64,
        num_decoder_blocks=2, num_decoder_heads=4, decoder_dim=64,
        backbone=args.backbone, backbone_width=args.backbone_width,
        stem=args.stem, compute_dtype="float32",
        max_objects=4, dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=args.batch_size, seed=0))
    model.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=1e-3, lr_schedule="constant",
        clipnorm=0.0))
    history = model.fit(
        lambda: pipe.batches(df, batch_size=args.batch_size, seed=0),
        epochs=args.epochs)

    # evaluate mAP on the training set (overfit sanity)
    result = metrics_lib.evaluate_map(
        model.trainer,
        pipe.batches(df, batch_size=args.batch_size, shuffle=False))
    print(f"final loss: {history['loss'][-1]:.3f}")
    print(f"mAP: {result['mAP']:.3f}  mAP50: {result['mAP50']:.3f}")

    # text-in/text-out sample
    cats, atts, boxes = model({"image": sample["image"][:1]})
    found = [(c, a) for c, a in zip(cats[0], atts[0]) if c != "<PAD>"]
    print("sample detections:", found[:5])
    return result


if __name__ == "__main__":
    main()
