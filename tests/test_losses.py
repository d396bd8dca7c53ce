"""Loss primitive tests: golden values vs Keras (BCE/CCE) and numpy oracles
for the tfa-derived formulas (focal, GIoU composite box loss), plus agreement
of the fast (matmul/gather) pairwise costs with the generic broadcast form."""

import numpy as np
import jax.numpy as jnp
import pytest

from boosted_detr_tpu.ops import losses as L
from boosted_detr_tpu.ops import boxes as B


def _np_bce(y, p, eps=1e-7):
    p = np.clip(p, eps, 1 - eps)
    return -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean(axis=-1)


def test_safe_clip():
    x = jnp.array([-1.0, 0.0, 0.5, 1.0, 2.0])
    assert np.allclose(L.safe_clip(x), [0.001, 0.001, 0.5, 0.999, 0.999])


def test_bce_matches_keras(rng):
    tf = pytest.importorskip("tensorflow")
    y = rng.integers(0, 2, size=(4, 6)).astype(np.float32)
    p = rng.uniform(0.01, 0.99, size=(4, 6)).astype(np.float32)
    keras_bce = tf.keras.losses.BinaryCrossentropy(
        label_smoothing=0, reduction="none")(y, p).numpy()
    ours = np.asarray(L.binary_crossentropy(jnp.asarray(y), jnp.asarray(p)))
    assert np.allclose(ours, keras_bce, atol=1e-5)


def test_cce_label_smoothing_matches_keras(rng):
    tf = pytest.importorskip("tensorflow")
    y = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=8)]
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    keras = tf.keras.losses.CategoricalCrossentropy(
        label_smoothing=0.1, reduction="none")(y, p).numpy()
    ours = np.asarray(L.categorical_crossentropy_ls(jnp.asarray(y), jnp.asarray(p)))
    assert np.allclose(ours, keras, atol=1e-3)


def test_category_loss_golden(rng):
    # For one-hot y: BCE(y, safe_clip(p) * y) ~= -log(safe_clip(p_true)) / V
    v = 10
    y = np.eye(v, dtype=np.float32)[rng.integers(0, v, size=(3,))]
    p = rng.uniform(0.01, 0.99, size=(3, v)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    ours = np.asarray(L.category_loss(jnp.asarray(y), jnp.asarray(p)))
    p_true = (p * y).sum(-1)
    expected = (-np.log(np.clip(p_true, 0.001, 0.999))
                - (v - 1) * np.log(1 - 1e-7)) / v
    assert np.allclose(ours, expected, atol=1e-5)


def test_focal_matches_tfa_formula(rng):
    # tfa.losses.sigmoid_focal_crossentropy with alpha=.25, gamma=2.0
    y = rng.integers(0, 2, size=(5, 7)).astype(np.float32)
    p = rng.uniform(0.05, 0.95, size=(5, 7)).astype(np.float32)
    ce = -(y * np.log(p) + (1 - y) * np.log(1 - p))
    p_t = y * p + (1 - y) * (1 - p)
    expected = (y * 0.25 + (1 - y) * 0.75) * (1 - p_t) ** 2 * ce
    ours = np.asarray(L.sigmoid_focal_elementwise(jnp.asarray(y), jnp.asarray(p)))
    assert np.allclose(ours, expected, atol=1e-5)


def test_box_loss_golden():
    # identical boxes: giou term 0, l2 term 0
    box = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    assert np.allclose(L.box_loss(box, box), 0.0, atol=1e-6)
    # known offset: COCO [0,0,1,1] vs [0,0,.5,1] -> corners (0,0,1,1)/(0,0,1,.5)
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 0.5, 1.0]])
    # iou = .5, giou = .5 (enclose = union), loss = 2*(1-.5) + 5*mean((10dx)^2)
    # corners diff: [0,0,0,.5] -> squares [0,0,0,25] -> mean 6.25 -> 31.25
    expected = 2 * 0.5 + 5 * 6.25
    assert np.allclose(L.box_loss(a, b), expected, atol=1e-4)


def test_exist_loss(rng):
    a = rng.integers(0, 2, size=(4, 9, 1)).astype(np.float32)
    p = rng.uniform(0, 1, size=(4, 9, 1)).astype(np.float32)
    ours = np.asarray(L.exist_loss(jnp.asarray(a), jnp.asarray(p)))
    expected = _np_bce(a, np.clip(p, 0.001, 0.999))
    assert np.allclose(ours, expected, atol=1e-5)


# --- fast pairwise forms agree with the generic broadcast form -------------


def test_category_cost_matches_generic(rng):
    b_, o, p_, v = 2, 5, 7, 11
    y = np.eye(v, dtype=np.float32)[rng.integers(0, v, size=(b_, o))]
    p = rng.uniform(0.01, 0.99, size=(b_, p_, v)).astype(np.float32)
    fast = np.asarray(L.category_cost(jnp.asarray(y), jnp.asarray(p)))
    generic = np.asarray(
        L.pairwise(L.category_loss, jnp.asarray(y), jnp.asarray(p)))
    assert fast.shape == (b_, o, p_)
    assert np.allclose(fast, generic, atol=1e-4)


def test_attribute_cost_matches_generic(rng):
    b_, o, p_, v = 2, 4, 6, 9
    y = rng.integers(0, 2, size=(b_, o, v)).astype(np.float32)
    p = rng.uniform(0.01, 0.99, size=(b_, p_, v)).astype(np.float32)
    fast = np.asarray(L.attribute_cost(jnp.asarray(y), jnp.asarray(p)))
    generic = np.asarray(
        L.pairwise(L.attribute_loss, jnp.asarray(y), jnp.asarray(p)))
    assert fast.shape == (b_, o, p_)
    assert np.allclose(fast, generic, atol=1e-4)


def test_box_cost_shape(rng):
    t = rng.uniform(0, 1, size=(2, 5, 4)).astype(np.float32)
    p = rng.uniform(0, 1, size=(2, 8, 4)).astype(np.float32)
    out = L.pairwise(L.box_loss, jnp.asarray(t), jnp.asarray(p))
    assert out.shape == (2, 5, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_category_match_loss(rng):
    # sum((1-p)*y): for one-hot y equals 1 - p_true
    v = 6
    y = np.eye(v, dtype=np.float32)[rng.integers(0, v, size=(3,))]
    p = rng.uniform(0, 1, size=(3, v)).astype(np.float32)
    out = np.asarray(L.category_match_loss(jnp.asarray(y), jnp.asarray(p)))
    assert np.allclose(out, 1.0 - (p * y).sum(-1), atol=1e-6)
