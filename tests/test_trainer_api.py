"""Trainer (compile/fit/checkpoint/NaN-guard) and public text-in/text-out API
tests on the synthetic dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boosted_detr_tpu import api
from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.data.pipeline import Pipeline
from boosted_detr_tpu.models.detr import DETR as DETRModule
from boosted_detr_tpu.train.trainer import NaNLossError, Trainer


TINY_KW = dict(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
    num_decoder_heads=2, decoder_dim=16)
TINY_OVER = dict(backbone="tiny", backbone_width=0.25,
                 compute_dtype="float32", max_objects=3, dropout_rate=0.0)


def _make_data():
    ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=1)
    df = ds.dataframes("train")
    return ds, df


def test_api_detr_end_to_end(tmp_path):
    ds, df = _make_data()
    model = api.DETR(vocab_dict=ds.get_vocab(), **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(
                      optimizer="adamw", learning_rate=3e-3,
                      lr_schedule="constant", clipnorm=0.0,
                      checkpoint_dir=str(tmp_path / "ckpt")))
    history = model.fit(lambda: pipe.batches(df, batch_size=4, seed=0),
                        epochs=6)
    assert min(history["loss"][-2:]) < history["loss"][0]

    # text-in/text-out inference (reference model.py:226-233 signature)
    cats, atts, boxes = model({"image": sample["image"]})
    assert cats.shape == (4, 8)
    assert boxes.shape == (4, 8, 4)
    assert isinstance(cats[0, 0], str)
    vocab = set(model.codec.category_vocab)
    assert all(c in vocab for c in cats.ravel())

    # training-mode call returns raw probs (reference model.py:223)
    probs = model({"image": sample["image"]}, training=True)
    assert np.allclose(np.asarray(probs["category"]).sum(-1), 1.0, atol=1e-4)

    # get_config parity: loss weights excluded
    cfg = model.get_config()
    assert "vocab_dict" in cfg and "category_weight" not in cfg


def test_trainer_checkpoint_roundtrip(tmp_path):
    ds, df = _make_data()
    codec = TextCodec(ds.get_vocab())
    sizes = codec.vocab_size_dict()
    mcfg = ModelConfig(**TINY_KW, num_categories=sizes["category"],
                       num_attributes=sizes["attributes"], **TINY_OVER)
    tcfg = TrainConfig(optimizer="adamw", lr_schedule="constant",
                       clipnorm=0.0, checkpoint_dir=str(tmp_path / "c"))
    pipe = Pipeline(mcfg.image_size, mcfg.max_objects, codec, dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))

    t1 = Trainer(DETRModule(mcfg), mcfg, tcfg, codec=codec)
    t1.compile(sample_batch=sample)
    t1.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)
    t1.save()
    step1 = int(t1.state.step)
    p1 = jax.tree_util.tree_leaves(t1.state.params)

    # fresh trainer restores from the checkpoint dir automatically
    t2 = Trainer(DETRModule(mcfg), mcfg, tcfg, codec=codec)
    t2.compile(sample_batch=sample)
    assert int(t2.state.step) == step1
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    assert all(np.allclose(a, b) for a, b in zip(p1, p2))


def test_trainer_nan_guard():
    ds, df = _make_data()
    codec = TextCodec(ds.get_vocab())
    sizes = codec.vocab_size_dict()
    mcfg = ModelConfig(**TINY_KW, num_categories=sizes["category"],
                       num_attributes=sizes["attributes"], **TINY_OVER)
    # absurd LR to force divergence -> NaN guard must fire (TerminateOnNaN
    # parity, reference DETR_COCO.ipynb cell 35)
    tcfg = TrainConfig(optimizer="sgd", learning_rate=1e18,
                       lr_schedule="constant", clipnorm=0.0)
    pipe = Pipeline(mcfg.image_size, mcfg.max_objects, codec, dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    tr = Trainer(DETRModule(mcfg), mcfg, tcfg, codec=codec)
    tr.compile(sample_batch=sample)
    with pytest.raises(NaNLossError):
        for _ in range(20):  # a few epochs at lr=1e18 must blow up
            tr.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)


def test_api_boosted_and_pretrainer():
    ds, df = _make_data()
    vocab = ds.get_vocab()
    model = api.BoostedDETR(vocab_dict=vocab, **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    hist = model.fit(lambda: pipe.batches(df, batch_size=4, seed=0),
                     epochs=2)
    assert np.isfinite(hist["loss"][-1])

    pre = api.DETR_MultiClassifier(model, vocab_dict=vocab, hidden_dim=16)
    # pretrainer wraps a plain DETR trunk; it shares config, not boosted
    pre.compile(sample_batch=sample, batch_size=4)
    pre.fit([{k: jnp.asarray(v) for k, v in sample.items()
              if k in ("image", "category_ids")}], epochs=2)


def test_save_load_model_roundtrip(tmp_path):
    """Whole-model persistence: save -> load -> identical predictions."""
    ds, df = _make_data()
    model = api.DETR(vocab_dict=ds.get_vocab(), **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)
    preds_before = model({"image": sample["image"]}, training=True)

    model.save(str(tmp_path / "saved"))
    loaded = api.load_model(str(tmp_path / "saved"), batch_size=4)
    preds_after = loaded({"image": sample["image"]}, training=True)
    for k in preds_before:
        assert np.allclose(np.asarray(preds_before[k]),
                           np.asarray(preds_after[k]), atol=1e-5), k


def test_fit_scan_steps_equivalent():
    """scan_steps groups dispatches without changing results materially."""
    ds, df = _make_data()
    def build():
        m = api.DETR(vocab_dict=ds.get_vocab(), **TINY_KW, **TINY_OVER)
        p = m.make_pipeline(dataset=ds)
        s = next(p.batches(df, batch_size=4, seed=0))
        m.compile(sample_batch=s, train_config=TrainConfig(
            optimizer="adamw", lr_schedule="constant", clipnorm=0.0,
            learning_rate=1e-3))
        return m, p

    m1, p1 = build()
    h1 = m1.fit(lambda: p1.batches(df, batch_size=4, seed=0), epochs=2)
    m2, p2 = build()
    h2 = m2.fit(lambda: p2.batches(df, batch_size=4, seed=0), epochs=2,
                scan_steps=2)
    assert np.isclose(h1["loss"][-1], h2["loss"][-1], rtol=1e-3)
    assert int(m1.trainer.state.step) == int(m2.trainer.state.step)


def test_export_inference_fn_and_transfer(tmp_path):
    """Serving export produces the text signature; API-level pretrainer
    transfer moves the trunk into the live detector state."""
    ds, df = _make_data()
    vocab = ds.get_vocab()
    model = api.DETR(vocab_dict=vocab, **TINY_KW, **TINY_OVER)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample,
                  train_config=TrainConfig(optimizer="adamw",
                                           lr_schedule="constant",
                                           clipnorm=0.0))
    serve = model.trainer.export_inference_fn()
    cats, atts, boxes = serve(sample["image"])
    assert cats.shape == (4, TINY_KW["num_object_preds"])
    assert boxes.shape[-1] == 4

    pre = api.DETR_MultiClassifier(model, vocab_dict=vocab, hidden_dim=16)
    pre.compile(sample_batch=sample, batch_size=4)
    pre.fit([{k: jnp.asarray(v) for k, v in sample.items()
              if k in ("image", "category_ids")}], epochs=3)
    before = jax.tree_util.tree_leaves(model.trainer.state.params["encoder"])
    pre.transfer_to_base()
    after = jax.tree_util.tree_leaves(model.trainer.state.params["encoder"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))
    # detector still works after the transfer
    cats, atts, boxes = model({"image": sample["image"]})
    assert cats.shape == (4, TINY_KW["num_object_preds"])
