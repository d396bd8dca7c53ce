"""The reference notebooks' full workflow (DETR_COCO.ipynb /
Boosted_DETR_COCO.ipynb) as a script — every cell's step mapped to this
framework. Requires network access to actually download Fashionpedia; each
stage is a function so the flow also serves as executable documentation.

Reference cell -> here:
  mount Drive + Filepaths (cells 1-6)   -> Filepaths dataclass
  dataset download + dataframes          -> Fashionpedia loader
  pipeline + augmentations (cell 16)     -> Pipeline + device augment_batch
  checkpoints (cell 18)                  -> TrainConfig.checkpoint_dir (orbax)
  classifier pre-training (cells 26-32)  -> DETR_MultiClassifier + transfer
  detection training (cell 35)           -> model.compile + fit (SGD,
                                            CosineDecayRestarts, clipnorm .1,
                                            NaN guard, TensorBoard)
  boosted staged training (Boosted c.30) -> train_block stages
  visualization (cells 22, 37)           -> utils.visualize
  TFRecord conversion                    -> data.tfrecord
  (new) COCO mAP evaluation              -> train.metrics.evaluate_map
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from boosted_detr_tpu import api
from boosted_detr_tpu.config import Filepaths, TrainConfig
from boosted_detr_tpu.data import vocabularies
from boosted_detr_tpu.data.augment import augment_batch
from boosted_detr_tpu.data.datasets import Fashionpedia
from boosted_detr_tpu.train import metrics as metrics_lib


def get_data(paths: Filepaths):
    loader = Fashionpedia(paths.archive_base_dir, paths.local_base_dir)
    loader.get_data(download=True, unzip=True)
    return loader, loader.dataframes("train"), loader.dataframes("val")


def build_model(paths: Filepaths) -> api.DETR:
    # reference-default geometry (parameters.py:160-178)
    return api.DETR(vocab_dict=vocabularies.vocab_dict("Fashionpedia"),
                    num_object_preds=96, image_size=(560, 560),
                    num_encoder_blocks=4, num_encoder_heads=8,
                    encoder_dim=256, num_decoder_blocks=4,
                    num_decoder_heads=8, decoder_dim=256)


def device_augment(batch, rng):
    """On-device batched augmentation stage (BASELINE config #4)."""
    key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
    out = augment_batch(key, {"image": batch["image"],
                              "bbox": batch["bbox"]})
    batch = dict(batch)
    batch["image"] = np.asarray(out["image"])
    batch["bbox"] = np.asarray(out["bbox"])
    return batch


def pretrain(model: api.DETR, pipe, train_df, epochs: int = 20):
    """Classifier pre-training sharing the detector trunk (cells 26-32).
    The base detector must be compiled first so the trained trunk can be
    transferred into its live state."""
    sample = next(pipe.batches(train_df, batch_size=8))
    if model.trainer is None:
        model.compile(sample_batch=sample)
    pre = api.DETR_MultiClassifier(
        model, vocab_dict=vocabularies.vocab_dict("Fashionpedia"))
    pre.compile(sample_batch=sample)
    pre.fit(lambda: pipe.batches(train_df, batch_size=8, repeat=False),
            epochs=epochs)
    pre.transfer_to_base()


def train_detection(model: api.DETR, pipe, train_df, val_df,
                    paths: Filepaths, epochs: int = 300):
    """Detection training with the reference's exact recipe (cells 26, 35):
    SGD(momentum .9, nesterov, clipnorm .1) + CosineDecayRestarts(1e-3, 4000,
    m_mul .95, alpha .1), batch 8, checkpoints each epoch, NaN guard.
    Re-compiling keeps the pre-trained weights by carrying the state over."""
    sample = next(pipe.batches(train_df, batch_size=8))
    prev_state = model.trainer.state if model.trainer else None
    model.compile(sample_batch=sample, train_config=TrainConfig(
        batch_size=8, optimizer="sgd", momentum=0.9, nesterov=True,
        clipnorm=0.1, learning_rate=1e-3, lr_schedule="cosine_restarts",
        warmup_steps=4000, checkpoint_dir=paths.checkpoint_save_dir))
    if prev_state is not None:
        model.trainer.state = model.trainer.state.replace(
            params=prev_state.params, batch_stats=prev_state.batch_stats)
    rng = np.random.default_rng(0)
    return model.fit(
        lambda: pipe.batches(train_df, batch_size=8,
                             augment=functools.partial(device_augment)),
        epochs=epochs,
        validation_batches=lambda: pipe.batches(val_df, batch_size=8,
                                                shuffle=False),
        tensorboard_dir="/tmp/tb/detection")


def evaluate(model: api.DETR, pipe, val_df):
    result = metrics_lib.evaluate_map(
        model.trainer, pipe.batches(val_df, batch_size=8, shuffle=False))
    print(f"Fashionpedia val mAP: {result['mAP']:.4f} "
          f"mAP50: {result['mAP50']:.4f}")
    return result


def main():
    paths = Filepaths(dataset_name="Fashionpedia",
                      archive_base_dir="/data/fashionpedia/archive",
                      local_base_dir="/data/fashionpedia/local",
                      checkpoint_save_dir="/data/checkpoints/detection")
    loader, train_df, val_df = get_data(paths)
    model = build_model(paths)
    pipe = model.make_pipeline()
    pretrain(model, pipe, train_df)
    train_detection(model, pipe, train_df, val_df, paths)
    evaluate(model, pipe, val_df)


if __name__ == "__main__":
    main()
