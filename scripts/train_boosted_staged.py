"""Staged boosted training demo: the reference's signature workflow —
freeze everything except one weak-learner block, train it, move to the next
(reference Boosted_DETR_COCO.ipynb cell 30: .trainable=False + recompile per
stage). Here each stage is just a new optimizer mask; parameters carry over
with no graph retracing.

Usage: python scripts/train_boosted_staged.py [--epochs-per-stage 100]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs-per-stage", type=int, default=100)
    parser.add_argument("--images", type=int, default=16)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from boosted_detr_tpu import api
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.data.datasets import SyntheticShapes
    from boosted_detr_tpu.train import metrics as metrics_lib

    ds = SyntheticShapes(num_images=args.images, image_size=64,
                         max_objects=3, seed=0)
    df = ds.dataframes("train")
    model = api.BoostedDETR(
        vocab_dict=ds.get_vocab(), num_object_preds=12, image_size=(64, 64),
        num_encoder_blocks=1, num_encoder_heads=4, encoder_dim=64,
        num_decoder_blocks=3, num_decoder_heads=4, decoder_dim=64,
        backbone="tiny", backbone_width=1.0, compute_dtype="float32",
        max_objects=4, dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=8, seed=0))

    # stage 0: train everything (warm start)
    model.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", learning_rate=1e-3, lr_schedule="constant",
        clipnorm=0.0, use_intermediate_losses=True))
    model.fit(lambda: pipe.batches(df, batch_size=8, seed=0),
              epochs=args.epochs_per_stage)
    params = model.trainer.state.params
    stats = model.trainer.state.batch_stats

    # staged boosting: one weak learner at a time, carrying parameters over
    for block in range(model.config.num_decoder_blocks):
        print(f"--- stage: training weak-learner block {block} ---")
        model.compile(sample_batch=sample, train_config=TrainConfig(
            optimizer="adamw", learning_rate=5e-4, lr_schedule="constant",
            clipnorm=0.0, use_intermediate_losses=True, train_block=block))
        model.trainer.state = model.trainer.state.replace(
            params=params, batch_stats=stats)
        model.fit(lambda: pipe.batches(df, batch_size=8, seed=0),
                  epochs=args.epochs_per_stage)
        params = model.trainer.state.params
        stats = model.trainer.state.batch_stats

    result = metrics_lib.evaluate_map(
        model.trainer, pipe.batches(df, batch_size=8, shuffle=False))
    print(f"mAP: {result['mAP']:.3f}  mAP50: {result['mAP50']:.3f}")


if __name__ == "__main__":
    main()
