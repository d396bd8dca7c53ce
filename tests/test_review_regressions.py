"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boosted_detr_tpu import api
from boosted_detr_tpu.config import LossWeights, ModelConfig, TrainConfig
from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.data.pipeline import Pipeline, prefetch_to_device
from boosted_detr_tpu.models.detr import DETR as DETRModule
from boosted_detr_tpu.train import metrics as M
from boosted_detr_tpu.train import steps
from boosted_detr_tpu.train.trainer import Trainer


TINY_KW = dict(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
    num_decoder_heads=2, decoder_dim=16)
TINY_OVER = dict(backbone="tiny", backbone_width=0.25,
                 compute_dtype="float32", max_objects=3, dropout_rate=0.0)


def _data():
    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=1)
    return ds, ds.dataframes("train")


def test_groupnorm_through_trainer():
    """Finding 1+9: norm='groupnorm' must work end-to-end (no batch_stats
    collection; adaptive group count for odd channel widths)."""
    ds, df = _data()
    model = api.DETR(vocab_dict=ds.get_vocab(), norm="groupnorm",
                     **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    hist = model.fit(lambda: pipe.batches(df, batch_size=4, seed=0),
                     epochs=2)
    assert np.isfinite(hist["loss"][-1])


def test_groupnorm_efficientnet_odd_channels(rng):
    from boosted_detr_tpu.models.backbone import EncoderBackbone

    bb = EncoderBackbone(backbone="efficientnet_lite", width=0.25,
                         norm="groupnorm")
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), img)
    out = bb.apply(v, img)
    assert np.isfinite(np.asarray(out)).all()


def test_compile_respects_explicit_loss_weights():
    """Finding 4: user-provided loss_weights must not be overwritten."""
    ds, df = _data()
    model = api.DETR(vocab_dict=ds.get_vocab(), **TINY_KW, **TINY_OVER)
    custom = LossWeights(category=500.0)
    tr = model.compile(train_config=TrainConfig(loss_weights=custom),
                       batch_size=2)
    assert tr.train_cfg.loss_weights.category == 500.0
    # default config still picks up the model's constructor-derived weights
    model2 = api.DETR(vocab_dict=ds.get_vocab(), attribute_weight=0.0,
                      **TINY_KW, **TINY_OVER)
    tr2 = model2.compile(batch_size=2)
    assert tr2.train_cfg.loss_weights.attribute == 0.0


def test_fit_rejects_exhausted_generator():
    """Finding 6: a plain generator with epochs > 1 must raise, not log 0."""
    ds, df = _data()
    model = api.DETR(vocab_dict=ds.get_vocab(), **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    gen = pipe.batches(df, batch_size=4, seed=0)  # NOT a callable
    with pytest.raises(ValueError, match="CALLABLE"):
        model.fit(gen, epochs=3)


def test_prefetch_propagates_errors():
    """Finding 5: iterator exceptions must surface, not truncate silently."""

    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_map50_with_custom_thresholds():
    """Finding 8: mAP50 must track the threshold VALUE, not column 0."""
    gt = [{"boxes": np.array([[0.0, 0.0, 1.0, 1.0]], np.float32),
           "labels": np.array([2])}]
    pred = [{"boxes": np.array([[0.0, 0.0, 0.74, 1.0]], np.float32),
             "scores": np.array([0.9], np.float32),
             "labels": np.array([2])}]  # IoU = 0.74
    res = M.compute_map(pred, gt, iou_thresholds=np.array([0.75, 0.5]))
    assert res["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["mAP75"] == pytest.approx(0.0, abs=1e-6)


def test_train_block_uses_only_focused_blocks_loss(rng):
    """Finding 3: with train_block=k, only block k's (cumulative) loss feeds
    gradients — earlier blocks' separate losses must not contribute."""
    from boosted_detr_tpu.models.boosted import BoostedDETR

    cfg = ModelConfig(num_categories=6, num_attributes=4, **{
        k: v for k, v in TINY_KW.items()}, **TINY_OVER)
    model = BoostedDETR(cfg)
    b, o = 2, 3
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 3)).astype(
            np.float32)),
        "category_ids": jnp.asarray(rng.integers(2, 6, (b, o)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, 4, (b, o, 2)),
                                     jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (b, o, 4)).astype(
            np.float32)),
        "num_objects": jnp.asarray([o, o - 1], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", lr_schedule="constant",
                       clipnorm=0.0, use_intermediate_losses=True,
                       train_block=1)
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    _, aux = jax.jit(steps.make_train_step(model, cfg, tcfg))(
        state, batch, jax.random.PRNGKey(1))
    # compare against the focused block's standalone loss
    outs = model.apply(variables, batch["image"], train=True,
                       return_intermediate=True,
                       rngs={"dropout": jax.random.PRNGKey(0)},
                       mutable=["batch_stats"])[0]
    ref_loss, _ = steps.compute_losses([outs[1]], batch, cfg,
                                       tcfg.loss_weights)
    assert np.isclose(float(aux["loss"]), float(ref_loss), rtol=1e-4)
