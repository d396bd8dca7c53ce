"""Fused patchify-stem kernel (ops/pallas_patchify.py): exactness vs the XLA
conv it replaces, gradient parity, preprocessing-affine folding, and
whole-model on/off equivalence (the flag must be a pure speed knob)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosted_detr_tpu.config import ModelConfig
from boosted_detr_tpu.models.detr import DETR
from boosted_detr_tpu.ops.pallas_patchify import patchify_conv, supported


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _xla_ref(x, w, patch, clip01=False):
    if clip01:
        x = jnp.clip(x, 0.0, 1.0)
    return lax.conv_general_dilated(
        x.astype(w.dtype), w, (patch, patch), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,patch,cout", [
    ((2, 64, 64, 3), 8, 128),   # flagship geometry, scaled down
    ((1, 32, 48, 3), 4, 64),    # patchify 4x4, non-square image
    ((2, 40, 40, 5), 8, 32),    # odd channel count, rows=1 grid
])
def test_forward_matches_xla_conv(rng, shape, patch, cout):
    x = jnp.asarray(rng.uniform(-0.2, 1.2, shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal(
        (patch, patch, shape[-1], cout)) * 0.1, jnp.float32)
    out = patchify_conv(x, w, clip01=True)
    ref = _xla_ref(x, w, patch, clip01=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match_xla_conv(rng):
    x = jnp.asarray(rng.uniform(-0.2, 1.2, (2, 64, 64, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 8, 3, 128)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)

    def f_new(x, w):
        return jnp.sum(patchify_conv(x, w, clip01=True) * g)

    def f_ref(x, w):
        return jnp.sum(_xla_ref(x, w, 8, clip01=True) * g)

    gx_n, gw_n = jax.grad(f_new, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gw_n), np.asarray(gw_r),
                               atol=1e-3, rtol=1e-3)
    # includes the clip mask: inputs outside [0,1] must get zero gradient
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)


def test_unsupported_geometry_falls_back(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 30, 30, 3)), jnp.float32)  # 30%8!=0
    w = jnp.asarray(rng.standard_normal((8, 8, 3, 16)) * 0.1, jnp.float32)
    assert not supported(x.shape, 8)
    out = patchify_conv(x, w)
    ref = _xla_ref(x, w, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _detr_pair(norm, preprocessing, rng):
    """Two DETRs differing ONLY in use_pallas_stem; identical param trees."""
    kw = dict(image_size=(64, 64), backbone="resnet", backbone_width=0.25,
              stem="patchify8", norm=norm, preprocessing=preprocessing,
              compute_dtype="float32", num_encoder_blocks=1,
              num_decoder_blocks=1, encoder_dim=32, decoder_dim=32,
              num_encoder_heads=2, num_decoder_heads=2, num_object_preds=4,
              num_categories=7, num_attributes=5, max_objects=3,
              dropout_rate=0.0)
    base = DETR(ModelConfig(**kw))
    fused = DETR(ModelConfig(use_pallas_stem=True, **kw))
    img = jnp.asarray(rng.uniform(-0.1, 1.1, (2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), img)
    v2 = jax.jit(fused.init)(jax.random.PRNGKey(0), img)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2)), "param trees must match"
    return base, fused, variables, img


@pytest.mark.parametrize("preprocessing", ["scale", "imagenet", "caffe"])
def test_model_output_unchanged_by_fused_stem(rng, preprocessing):
    base, fused, variables, img = _detr_pair("batchnorm", preprocessing, rng)
    out_b = base.apply(variables, img)
    out_f = fused.apply(variables, img)
    for k in out_b:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_f[k]),
                                   atol=2e-4, rtol=2e-3, err_msg=k)


def test_model_output_unchanged_skipinit(rng):
    """Weight-standardized (norm-free) stem: WSConv math + fused kernel."""
    base, fused, variables, img = _detr_pair("skipinit", "scale", rng)
    out_b = base.apply(variables, img)
    out_f = fused.apply(variables, img)
    for k in out_b:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_f[k]),
                                   atol=2e-4, rtol=2e-3, err_msg=k)


def test_vit_patch_embed_unchanged_by_fused_stem(rng):
    """The ViT patch embed has the same 3-channel layout problem; the fused
    path must be output-identical (incl. the nn.Conv-parity bias)."""
    kw = dict(image_size=(64, 64), backbone="vit_p32_d2_w64_h2",
              compute_dtype="float32", num_encoder_blocks=1,
              num_decoder_blocks=1, encoder_dim=32, decoder_dim=32,
              num_encoder_heads=2, num_decoder_heads=2, num_object_preds=4,
              num_categories=7, num_attributes=5, max_objects=3,
              dropout_rate=0.0)
    base = DETR(ModelConfig(**kw))
    fused = DETR(ModelConfig(use_pallas_stem=True, **kw))
    img = jnp.asarray(rng.uniform(-0.1, 1.1, (2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), img)
    v2 = jax.jit(fused.init)(jax.random.PRNGKey(0), img)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    out_b = base.apply(variables, img)
    out_f = fused.apply(variables, img)
    for k in out_b:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_f[k]),
                                   atol=2e-4, rtol=2e-3, err_msg=k)


def test_fused_stem_trains(rng):
    """One train step end to end (value_and_grad through the custom vjp)."""
    from boosted_detr_tpu.config import TrainConfig
    from boosted_detr_tpu.train import steps

    kw = dict(image_size=(64, 64), backbone="resnet", backbone_width=0.25,
              stem="patchify8", compute_dtype="float32",
              use_pallas_stem=True, num_encoder_blocks=1,
              num_decoder_blocks=1, encoder_dim=32, decoder_dim=32,
              num_encoder_heads=2, num_decoder_heads=2, num_object_preds=4,
              num_categories=7, num_attributes=5, max_objects=3,
              dropout_rate=0.0, matcher="hungarian")
    cfg = ModelConfig(**kw)
    model = DETR(cfg)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "category_ids": jnp.asarray(rng.integers(2, 7, (2, 3)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, 5, (2, 3, 2)),
                                     jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (2, 3, 4)), jnp.float32),
        "num_objects": jnp.asarray([2, 3], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(batch_size=2, optimizer="adamw", learning_rate=1e-3)
    state = steps.TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    train_step = jax.jit(steps.make_train_step(model, cfg, tcfg))
    l0 = None
    for i in range(5):
        state, aux = train_step(state, batch, jax.random.PRNGKey(i))
        l0 = l0 if l0 is not None else float(aux["loss"])
    assert float(aux["loss"]) < l0
    assert np.isfinite(float(aux["loss"]))
