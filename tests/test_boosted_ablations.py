"""Boosted-architecture ablation variants (VERDICT r4 #1).

Pins the three flag-gated architecture deltas used to interrogate the
namesake ensemble: carried queries (vs the reference's fresh zero-init
queries per block, boosted_model.py:210-211), the reference README's dark
"Option 2" confidence-masked carry-forward (reference README.md:83-88), and
the shared-encoder ablation (vs per-block 1-block encoders,
boosted_model.py:85-92). Default flags must leave the baseline bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.models.boosted import BoostedDETR
from boosted_detr_tpu.train import steps

TINY = ModelConfig(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=2,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=3,
    num_decoder_heads=2, decoder_dim=16, num_categories=6, num_attributes=4,
    backbone="tiny", backbone_width=0.25, compute_dtype="float32",
    max_objects=3, dropout_rate=0.0)


def _img(rng, b=2):
    return jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 3)).astype(np.float32))


def _batch(rng, b=2, o=3):
    return {
        "image": _img(rng, b),
        "category_ids": jnp.asarray(
            rng.integers(2, TINY.num_categories, (b, o)), jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, TINY.num_attributes, (b, o, 2)), jnp.int32),
        "bbox": jnp.asarray(
            rng.uniform(0.1, 0.4, (b, o, 4)).astype(np.float32)),
        "num_objects": jnp.asarray([o, o - 1][:b], jnp.int32),
    }


def test_carry_queries_same_params_different_outputs(rng):
    """'carry' reuses the SAME parameter tree (only the dataflow changes)
    and must change block >0 outputs but not block 0."""
    img = _img(rng)
    base = BoostedDETR(TINY)
    v = jax.jit(base.init)(jax.random.PRNGKey(0), img)
    out_fresh = base.apply(v, img, return_intermediate=True)
    carry = BoostedDETR(TINY.replace(boosted_queries="carry"))
    out_carry = carry.apply(v, img, return_intermediate=True)
    assert np.allclose(np.asarray(out_fresh[0]["category"]),
                       np.asarray(out_carry[0]["category"]), atol=1e-6)
    assert not np.allclose(np.asarray(out_fresh[-1]["category"]),
                           np.asarray(out_carry[-1]["category"]), atol=1e-4)


def test_confidence_mode_outputs_are_distributions(rng):
    """Per-block outputs replace cumulative sums: every block's category
    output is a calibrated softmax (sums to num_preds per image)."""
    img = _img(rng)
    model = BoostedDETR(TINY.replace(boosted_queries="confidence"))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outs = model.apply(v, img, return_intermediate=True)
    assert len(outs) == TINY.num_decoder_blocks
    for o in outs:
        s = np.asarray(o["category"]).sum(axis=-1)
        assert np.allclose(s, 1.0, atol=1e-3)


def test_confidence_threshold_zero_freezes_at_block0(rng):
    """threshold 0.0: every slot freezes after block 0, so the final output
    IS block 0's output (features and predictions carried untouched)."""
    img = _img(rng)
    model = BoostedDETR(TINY.replace(boosted_queries="confidence",
                                     boosted_carry_threshold=0.0))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outs = model.apply(v, img, return_intermediate=True)
    for k in ("category", "attribute", "boxes"):
        assert np.allclose(np.asarray(outs[0][k]), np.asarray(outs[-1][k]),
                           atol=1e-6)


def test_confidence_threshold_above_one_never_freezes(rng):
    """threshold > 1: nothing freezes; block i's output is block i's own
    heads on carried-and-updated features (matches 'carry' mode dataflow
    with per-block heads)."""
    img = _img(rng)
    model = BoostedDETR(TINY.replace(boosted_queries="confidence",
                                     boosted_carry_threshold=1.1))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outs = model.apply(v, img, return_intermediate=True)
    assert not np.allclose(np.asarray(outs[0]["category"]),
                           np.asarray(outs[-1]["category"]), atol=1e-4)


def test_shared_encoder_param_structure(rng):
    img = _img(rng)
    model = BoostedDETR(TINY.replace(boosted_shared_encoder=True))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    assert "encoder_shared" in v["params"]
    assert "encoder_1" not in v["params"]
    outs = model.apply(v, img, return_intermediate=True)
    assert len(outs) == TINY.num_decoder_blocks


@pytest.mark.parametrize("cfg_kw", [
    dict(boosted_queries="carry"),
    dict(boosted_queries="confidence", boosted_carry_threshold=0.5),
    dict(boosted_shared_encoder=True),
])
def test_variants_train_step_runs_and_grads_flow(rng, cfg_kw):
    cfg = TINY.replace(matcher="hungarian", **cfg_kw)
    model = BoostedDETR(cfg)
    batch = _batch(rng)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="adamw", learning_rate=1e-3,
                       lr_schedule="constant", clipnorm=0.0,
                       use_intermediate_losses=True, batch_size=2)
    state = steps.TrainState.create(
        v["params"], v.get("batch_stats", {}),
        steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    train_step = jax.jit(steps.make_train_step(model, cfg, tcfg))
    state2, aux = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    # some decoder-block-2 parameter must have moved (gradient reached the
    # deepest block through the carry/freeze dataflow)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["decoder_block_2"], state2.params["decoder_block_2"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_default_flags_keep_baseline_bitwise(rng):
    """The ablation flags default OFF: same params, same outputs as the
    pre-flag baseline path (same-code comparability guarantee)."""
    img = _img(rng)
    model = BoostedDETR(TINY)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = model.apply(v, img, return_intermediate=True)
    # cumulative-sum property of the baseline (block k sums k+1 softmaxes)
    s = np.asarray(out[2]["category"]).sum(axis=-1)
    assert np.allclose(s, 3.0, atol=1e-3)
