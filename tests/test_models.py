"""Model shape-contract and numerics tests (the reference's only 'tests' were
show_summary() shape prints and notebook forward smoke checks, SURVEY §4 —
here they are real assertions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boosted_detr_tpu.config import ModelConfig
from boosted_detr_tpu.models import layers
from boosted_detr_tpu.models.backbone import (BackboneNeck, EncoderBackbone)
from boosted_detr_tpu.models.detr import DETR
from boosted_detr_tpu.models.heads import (BoxPredictionHead,
                                           MultiClassPredictionHead,
                                           SingleClassPredictionHead)


TINY = ModelConfig(
    num_object_preds=10, image_size=(64, 64), num_encoder_blocks=2,
    num_encoder_heads=2, encoder_dim=32, num_decoder_blocks=3,
    num_decoder_heads=2, decoder_dim=32, num_categories=7, num_attributes=5,
    backbone="tiny", backbone_width=0.5, compute_dtype="float32",
    max_objects=4)


def test_trig_positional_init_matches_reference_formula():
    # reference transformers.py:282-292
    import math
    pos = layers.trig_positional_init(6, 4)
    for k in range(6):
        for d in range(4):
            denom = 2 * (1 + d) / 4
            even = k % 2
            odd = (k + 1) % 2
            expected = even * math.sin(k / denom) + odd * math.cos(k / denom)
            assert np.isclose(pos[k, d], expected, atol=1e-6), (k, d)


def test_mha_shapes_and_mask_quirk(rng):
    mha = layers.MultiheadAttention(num_heads=2)
    q = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), q, kv, kv)
    out = mha.apply(params, q, kv, kv)
    assert out.shape == (2, 5, 8)
    # post-softmax multiplicative mask: zero mask -> zero attention output
    # contribution (probs * 0), so output = output-projection bias only
    mask = jnp.zeros((2, 2, 5, 7))
    out_masked = mha.apply(params, q, kv, kv, mask)
    bias = params["params"]["output_projection"]["bias"]
    assert np.allclose(np.asarray(out_masked),
                       np.broadcast_to(bias, out_masked.shape), atol=1e-6)


def test_encoder_block_runs(rng):
    blk = layers.EncoderBlock(num_heads=2, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, pos)
    out = blk.apply(params, x, pos)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_backbone_stride_32(rng):
    for name in ("tiny", "resnet", "efficientnet_lite"):
        bb = EncoderBackbone(backbone=name, width=0.25)
        img = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
        variables = bb.init(jax.random.PRNGKey(0), img)
        out = bb.apply(variables, img)
        assert out.shape[:3] == (1, 2, 3), (name, out.shape)


def test_resnet_patchify_stem_same_contract(rng):
    """The TPU-first patchify stems keep the conv7 stem's output contract
    (stride 32 overall, same channel count) and the patchify8 bench
    flagship trains (loss decreases on a fixed batch)."""
    import optax

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps

    img = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)).astype(np.float32))
    outs = {}
    for stem in ("conv7", "patchify", "patchify8"):
        bb = EncoderBackbone(backbone="resnet", width=0.25, stem=stem)
        variables = bb.init(jax.random.PRNGKey(0), img)
        outs[stem] = bb.apply(variables, img)
    assert outs["conv7"].shape == outs["patchify"].shape
    # patchify8 skips the stride-4 stage but keeps the output contract
    assert outs["conv7"].shape == outs["patchify8"].shape

    cfg = ModelConfig(
        num_object_preds=8, image_size=(64, 64), num_encoder_blocks=1,
        num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
        num_decoder_heads=2, decoder_dim=16, num_categories=6,
        num_attributes=4, backbone="resnet", backbone_width=0.25,
        stem="patchify8", compute_dtype="float32", max_objects=3,
        dropout_rate=0.0)
    tcfg = TrainConfig(optimizer="adamw", learning_rate=1e-3,
                       lr_schedule="constant", clipnorm=0.0)
    model = DETR(cfg)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)),
                             jnp.float32),
        "category_ids": jnp.asarray(rng.integers(2, 6, (2, 3)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, 4, (2, 3, 2)),
                                     jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (2, 3, 4)), jnp.float32),
        "num_objects": jnp.full((2,), 3, jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    step = jax.jit(steps.make_train_step(model, cfg, tcfg))
    first = None
    for _ in range(15):
        state, aux = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < 0.9 * first


def test_vit_backbone_stride_32_contract_and_spec(rng):
    """The ViT backbone honors the shared stride-32 grid contract (TPU-first
    extension; no reference counterpart) and its spec string parses."""
    from boosted_detr_tpu.models.backbone import parse_vit_spec

    assert parse_vit_spec("vit", 1.0) == (384, 8, 6, 16, False)
    assert parse_vit_spec("vit_p32_d2_w64_h2", 1.0) == (64, 2, 2, 32, False)
    assert parse_vit_spec("vit_p16_qk", 1.0) == (384, 8, 6, 16, True)
    for bad in ("vit_", "vit_pallas", "vit_x32", "vit_p"):
        with pytest.raises(ValueError):
            parse_vit_spec(bad, 1.0)
    # a typo like "vitp32" must not silently train the default ViT
    with pytest.raises(ValueError):
        EncoderBackbone(backbone="vitp32").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    img = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    for spec, channels in (("vit_d1_w32_h2", 64),  # patch16 + 2x reduce conv
                           ("vit_p32_d1_w32_h2", 32),  # direct patch32
                           ("vit_d1_w32_h2_qk", 64)):  # QK-norm stabilizer
        bb = EncoderBackbone(backbone=spec, width=1.0)
        variables = bb.init(jax.random.PRNGKey(0), img)
        out = bb.apply(variables, img)
        assert out.shape == (1, 2, 3, channels), (spec, out.shape)
        assert "batch_stats" not in variables  # norm-free by design
        # qk spec adds the per-head norm params; others must not
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        has_qk = any("q_norm" in jax.tree_util.keystr(p) for p, _ in flat)
        assert has_qk == spec.endswith("_qk"), spec


def test_vit_detr_trains(rng):
    """DETR with the ViT backbone runs a jitted train step and learns."""
    import optax  # noqa: F401

    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.train import steps

    cfg = ModelConfig(
        num_object_preds=8, image_size=(64, 64), num_encoder_blocks=1,
        num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
        num_decoder_heads=2, decoder_dim=16, num_categories=6,
        num_attributes=4, backbone="vit_d2_w32_h2",
        compute_dtype="float32", max_objects=3, dropout_rate=0.0)
    tcfg = TrainConfig(optimizer="adamw", learning_rate=1e-3,
                       lr_schedule="constant", clipnorm=0.0)
    model = DETR(cfg)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)),
                             jnp.float32),
        "category_ids": jnp.asarray(rng.integers(2, 6, (2, 3)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, 4, (2, 3, 2)),
                                     jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (2, 3, 4)), jnp.float32),
        "num_objects": jnp.full((2,), 3, jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    step = jax.jit(steps.make_train_step(model, cfg, tcfg))
    first = None
    for _ in range(15):
        state, aux = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < 0.9 * first


def test_neck_projects_dim(rng):
    neck = BackboneNeck(encoder_dim=16)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 64)).astype(np.float32))
    variables = neck.init(jax.random.PRNGKey(0), x)
    out = neck.apply(variables, x)
    assert out.shape == (2, 3, 3, 16)
    assert np.abs(np.asarray(out)).max() < 50  # tanh then norm: bounded-ish


def test_heads_output_ranges(rng):
    feats = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    box = BoxPredictionHead(hidden_dim=32, num_preds=10)
    v = box.init(jax.random.PRNGKey(0), feats)
    boxes = box.apply(v, feats)
    assert boxes.shape == (2, 10, 4)
    # expanded sigmoid range (-1, 2) (reference prediction_heads.py:44)
    assert np.all(np.asarray(boxes) > -1.0) and np.all(np.asarray(boxes) < 2.0)

    cat = SingleClassPredictionHead(num_classes=7, hidden_dim=16, num_preds=10)
    v = cat.init(jax.random.PRNGKey(0), feats)
    probs = cat.apply(v, feats)
    assert probs.shape == (2, 10, 7)
    assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    assert probs.dtype == jnp.float32

    att = MultiClassPredictionHead(num_classes=5, hidden_dim=16, num_preds=10)
    v = att.init(jax.random.PRNGKey(0), feats)
    probs = att.apply(v, feats)
    assert probs.shape == (2, 10, 5)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_head_token_resize(rng):
    # when token count != num_preds the Conv1D-equivalent resize kicks in
    # (reference prediction_heads.py:53-56; used by the pretrainer path)
    feats = jnp.asarray(rng.normal(size=(2, 13, 32)).astype(np.float32))
    cat = SingleClassPredictionHead(num_classes=7, hidden_dim=16, num_preds=10)
    v = cat.init(jax.random.PRNGKey(0), feats)
    probs = cat.apply(v, feats)
    assert probs.shape == (2, 10, 7)


def test_detr_forward_shapes(rng):
    model = DETR(TINY)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    assert preds["category"].shape == (2, 10, 7)
    assert preds["attribute"].shape == (2, 10, 5)
    assert preds["boxes"].shape == (2, 10, 4)
    for v in preds.values():
        assert np.isfinite(np.asarray(v)).all()


def test_detr_intermediate_outputs(rng):
    model = DETR(TINY)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(variables, img, return_intermediate=True)
    assert len(outs) == TINY.num_decoder_blocks
    # blocks differ, so predictions must differ
    assert not np.allclose(np.asarray(outs[0]["boxes"]),
                           np.asarray(outs[-1]["boxes"]))


def test_detr_train_mode_mutates_batch_stats(rng):
    model = DETR(TINY)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    preds, mutated = model.apply(
        variables, img, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mutated
    # running stats changed from init
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_detr_bf16_compute(rng):
    cfg = TINY.replace(compute_dtype="bfloat16")
    model = DETR(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    # outputs stay f32 (heads pinned), finite under bf16 compute
    assert preds["category"].dtype == jnp.float32
    assert np.isfinite(np.asarray(preds["boxes"])).all()
    # params stay f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(variables["params"]))
