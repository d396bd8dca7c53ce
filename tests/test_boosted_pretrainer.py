"""Boosted DETR + classifier pre-trainer tests (reference configs #2/#4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.models.boosted import BoostedDETR
from boosted_detr_tpu.models.detr import DETR
from boosted_detr_tpu.models import pretrainer as pt
from boosted_detr_tpu.train import steps


TINY = ModelConfig(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=3,
    num_decoder_heads=2, decoder_dim=16, num_categories=6, num_attributes=4,
    backbone="tiny", backbone_width=0.25, compute_dtype="float32",
    max_objects=3, dropout_rate=0.0)


def _batch(rng, b=2, o=3):
    return {
        "image": jnp.asarray(
            rng.uniform(0, 1, (b, 32, 32, 3)).astype(np.float32)),
        "category_ids": jnp.asarray(
            rng.integers(2, TINY.num_categories, (b, o)), jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, TINY.num_attributes, (b, o, 2)), jnp.int32),
        "bbox": jnp.asarray(
            rng.uniform(0.1, 0.4, (b, o, 4)).astype(np.float32)),
        "num_objects": jnp.asarray([o, o - 1][:b], jnp.int32),
    }


def test_boosted_forward_cumulative(rng):
    model = BoostedDETR(TINY)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outs = model.apply(variables, img, return_intermediate=True)
    assert len(outs) == TINY.num_decoder_blocks
    # cumulative sums: category "probs" grow roughly with the block index
    s0 = float(np.asarray(outs[0]["category"]).sum())
    s2 = float(np.asarray(outs[2]["category"]).sum())
    # each block adds a softmax summing to num_preds per image
    assert np.isclose(s0, 2 * TINY.num_object_preds, rtol=1e-3)
    assert np.isclose(s2, 3 * 2 * TINY.num_object_preds, rtol=1e-3)


def test_boosted_block0_double_count_flag(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    m_fixed = BoostedDETR(TINY)
    v = jax.jit(m_fixed.init)(jax.random.PRNGKey(0), img)
    out_fixed = m_fixed.apply(v, img, return_intermediate=True)
    m_quirk = BoostedDETR(TINY.replace(block0_double_count=True))
    out_quirk = m_quirk.apply(v, img, return_intermediate=True)
    # block 0 output doubled in quirk mode (reference boosted_model.py:222-229)
    assert np.allclose(np.asarray(out_quirk[0]["category"]),
                       2 * np.asarray(out_fixed[0]["category"]), atol=1e-5)


def test_boosted_focused_training_layer(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    model = BoostedDETR(TINY, focused_training_layer=1)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outs = model.apply(v, img, return_intermediate=True)
    assert len(outs) == 1  # only the focused block's cumulative preds


def test_boosted_trains(rng):
    model = BoostedDETR(TINY)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", learning_rate=3e-3,
                       lr_schedule="constant", clipnorm=0.0,
                       use_intermediate_losses=True)  # boosted always
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    train_step = jax.jit(steps.make_train_step(model, TINY, tcfg))
    first = None
    for _ in range(40):
        state, aux = train_step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last) and last < 0.8 * first, (first, last)


def test_pretrainer_forward_and_loss(rng):
    model = pt.DETRMultiClassifier(TINY, num_classifier_classes=9,
                                   hidden_dim=16)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    outs = model.apply(variables, batch["image"], return_intermediate=True)
    assert len(outs) == TINY.num_decoder_blocks
    assert outs[0].shape == (2, 1, 9)
    metrics = pt.pretrain_loss(outs, batch["category_ids"], 9)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_pretrainer_trains_and_transfers(rng):
    model = pt.DETRMultiClassifier(TINY, num_classifier_classes=9,
                                   hidden_dim=16)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", learning_rate=3e-3,
                       lr_schedule="constant", clipnorm=0.0)
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    step = jax.jit(pt.make_pretrain_step(model))
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first

    # transfer: trained trunk merged into a standalone detector
    trained = {"params": state.params, "batch_stats": state.batch_stats}
    detector = DETR(TINY)
    detr_init = jax.jit(detector.init)(jax.random.PRNGKey(3), batch["image"])
    detr_vars = pt.transfer_to_detr(trained, detr_init)
    preds = detector.apply(detr_vars, batch["image"])
    assert np.isfinite(np.asarray(preds["boxes"])).all()
    # trunk weights actually moved (encoder differs from fresh init)
    a = jax.tree_util.tree_leaves(detr_vars["params"]["encoder"])
    b = jax.tree_util.tree_leaves(detr_init["params"]["encoder"])
    assert any(not np.allclose(x, y) for x, y in zip(a, b))
    # heads remain the detector's own init
    a = jax.tree_util.tree_leaves(detr_vars["params"]["category_head"])
    b = jax.tree_util.tree_leaves(detr_init["params"]["category_head"])
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_pretrainer_param_structure_matches_detr(rng):
    """The 'detr' subtree must be loadable into a standalone DETR (checkpoint
    interop, reference DETR_COCO.ipynb cell 32)."""
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    detector = DETR(TINY)
    dv = jax.jit(detector.init)(jax.random.PRNGKey(0), img)
    pre = pt.DETRMultiClassifier(TINY, num_classifier_classes=9,
                                 hidden_dim=16)
    pv = jax.jit(pre.init)(jax.random.PRNGKey(1), img)
    # the pre-trainer's detr subtree covers exactly the shared trunk keys
    sub_keys = set(pv["params"]["detr"].keys())
    detr_keys = set(dv["params"].keys())
    assert sub_keys <= detr_keys
    assert {"backbone", "neck", "encoder", "decoder_prep"} <= sub_keys
