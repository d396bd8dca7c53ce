"""Training engine tests: schedule golden values vs Keras, optimizer clipnorm
semantics, staged freezing, and the end-to-end overfit smoke test (tiny DETR
on synthetic data, loss must drop — SURVEY §7 minimum slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.models.detr import DETR
from boosted_detr_tpu.train import schedules, steps


TINY = ModelConfig(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
    num_decoder_heads=2, decoder_dim=16, num_categories=6, num_attributes=4,
    backbone="tiny", backbone_width=0.25, compute_dtype="float32",
    max_objects=3, dropout_rate=0.0)


def test_cosine_restarts_matches_keras():
    tf = pytest.importorskip("tensorflow")
    keras_sched = tf.keras.optimizers.schedules.CosineDecayRestarts(
        1e-3, 400, t_mul=2.0, m_mul=0.95, alpha=0.1)
    ours = schedules.cosine_decay_restarts(1e-3, 400, t_mul=2.0, m_mul=0.95,
                                           alpha=0.1)
    for step in [0, 1, 100, 399, 400, 401, 799, 1200, 5000, 20000]:
        expected = float(keras_sched(step).numpy())
        got = float(ours(jnp.asarray(step)))
        assert np.isclose(got, expected, rtol=1e-4), (step, got, expected)


def test_aiayn_schedule_shape():
    s = schedules.aiayn_schedule(256, warmup_steps=100)
    lrs = [float(s(jnp.asarray(t))) for t in [1, 50, 100, 200, 1000]]
    assert lrs[0] < lrs[1] < lrs[2]  # warmup rises
    assert lrs[2] > lrs[3] > lrs[4]  # then decays


def test_per_variable_clipnorm():
    clip = optax.GradientTransformation(
        *steps.clip_by_per_variable_norm(0.1))
    grads = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.01])}
    out, _ = clip.update(grads, clip.init(grads))
    # 'a' has norm 5 -> scaled to norm 0.1; 'b' untouched (norm < 0.1)
    assert np.isclose(np.linalg.norm(np.asarray(out["a"])), 0.1, atol=1e-6)
    assert np.isclose(float(out["b"][0]), 0.01, atol=1e-8)


def _synthetic_batch(rng, b=4, o=3, words=2):
    img = rng.uniform(0, 1, size=(b, 32, 32, 3)).astype(np.float32)
    return {
        "image": jnp.asarray(img),
        "category_ids": jnp.asarray(
            rng.integers(2, TINY.num_categories, size=(b, o)), jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, TINY.num_attributes, size=(b, o, words)),
            jnp.int32),
        "bbox": jnp.asarray(
            rng.uniform(0.1, 0.4, size=(b, o, 4)).astype(np.float32)),
        "num_objects": jnp.asarray([o, o - 1, o, o - 2][:b], jnp.int32),
    }


def test_targets_from_batch(rng):
    batch = _synthetic_batch(rng)
    cat, att = steps.targets_from_batch(batch, TINY.num_categories,
                                        TINY.num_attributes)
    assert cat.shape == (4, 3, 6) and att.shape == (4, 3, 4)
    assert np.allclose(np.asarray(cat).sum(-1), 1.0)
    assert np.asarray(att).max() <= 1.0


def test_overfit_tiny_detr(rng):
    """Minimum end-to-end slice: jitted train step (forward + cost + on-device
    Hungarian + loss + backward + SGD) overfits a fixed synthetic batch."""
    model = DETR(TINY)
    batch = _synthetic_batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])

    tcfg = TrainConfig(optimizer="adamw", learning_rate=3e-3,
                       lr_schedule="constant", clipnorm=0.0)
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    train_step = jax.jit(steps.make_train_step(model, TINY, tcfg))

    rng_key = jax.random.PRNGKey(1)
    first = None
    for i in range(60):
        state, aux = train_step(state, batch, rng_key)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.7 * first, (first, last)
    # all loss parts finite and reported
    for k in ("loss_total", "loss_category", "loss_attribute", "loss_box",
              "loss_exist", "iou"):
        assert np.isfinite(float(aux[k])), k


def test_eval_step_runs(rng):
    model = DETR(TINY)
    batch = _synthetic_batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig()
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    aux = jax.jit(steps.make_eval_step(model, TINY, tcfg))(state, batch)
    assert np.isfinite(float(aux["loss"]))


def test_staged_freezing_mask(rng):
    """optax.multi_transform freezing: frozen params must not change
    (replacement for the reference's .trainable=False + recompile,
    Boosted_DETR_COCO.ipynb cell 30)."""
    model = DETR(TINY)
    batch = _synthetic_batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    params = variables["params"]

    # freeze the backbone, train everything else
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: getattr(path[0], "key", None) != "backbone", params)
    tcfg = TrainConfig(optimizer="adamw", lr_schedule="constant",
                       clipnorm=0.0)
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim,
                              trainable_mask=mask)
    state = steps.TrainState.create(params, variables["batch_stats"], tx)
    train_step = jax.jit(steps.make_train_step(model, TINY, tcfg))
    new_state, _ = train_step(state, batch, jax.random.PRNGKey(1))

    frozen_before = jax.tree_util.tree_leaves(params["backbone"])
    frozen_after = jax.tree_util.tree_leaves(new_state.params["backbone"])
    assert all(np.allclose(a, b) for a, b in zip(frozen_before, frozen_after))
    head_before = jax.tree_util.tree_leaves(params["category_head"])
    head_after = jax.tree_util.tree_leaves(new_state.params["category_head"])
    assert any(not np.allclose(a, b)
               for a, b in zip(head_before, head_after))


def test_yaml_cli_config_overlay(tmp_path):
    from boosted_detr_tpu import config as C

    path = tmp_path / "cfg.yaml"
    path.write_text(
        "model:\n  encoder_dim: 128\n  image_size: [320, 320]\n"
        "train:\n  batch_size: 4\n  loss_weights:\n    category: 500.0\n")
    mcfg, tcfg = C.from_yaml(str(path), **{"model.num_encoder_blocks": 2,
                                           "train.learning_rate": 5e-4})
    assert mcfg.encoder_dim == 128 and mcfg.image_size == (320, 320)
    assert mcfg.num_encoder_blocks == 2
    assert tcfg.batch_size == 4 and tcfg.learning_rate == 5e-4
    assert tcfg.loss_weights.category == 500.0


def test_filepaths_parity():
    from boosted_detr_tpu.config import Filepaths

    fp = Filepaths(dataset_name="Fashionpedia")
    params = fp.default_params()
    assert params["dataset_name"] == "Fashionpedia"
    assert fp.default_params("checkpoint_save_dir") == "/tmp/checkpoints"


def test_freeze_bn_stats_trains_params_without_touching_stats():
    """TrainConfig.freeze_bn_stats: the frozen-BN speed tier must keep
    batch_stats BIT-identical while params still update (the train step
    normalizes with running averages and skips the stat reduction)."""
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps as steps_lib

    cfg = ModelConfig(
        num_object_preds=6, image_size=(32, 32), num_encoder_blocks=1,
        num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=1,
        num_decoder_heads=2, decoder_dim=16, num_categories=5,
        num_attributes=4, backbone="tiny", backbone_width=0.25,
        compute_dtype="float32", max_objects=3, dropout_rate=0.0,
        matcher="hungarian")
    model = DETR(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32),
        "category_ids": jnp.asarray(rng.integers(2, 5, (2, 3)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, 4, (2, 3, 2)),
                                     jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (2, 3, 4)), jnp.float32),
        "num_objects": jnp.asarray([2, 1], jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", learning_rate=1e-3,
                       lr_schedule="constant", clipnorm=0.0,
                       freeze_bn_stats=True)
    state = steps_lib.TrainState.create(
        variables["params"], variables["batch_stats"],
        steps_lib.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    step = jax.jit(steps_lib.make_train_step(model, cfg, tcfg))
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    # stats bit-identical
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved
