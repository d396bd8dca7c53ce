"""Matcher tests: the on-device solvers vs the scipy Hungarian oracle over
randomized cost matrices, with the reference's first-num_objects-rows masking
semantics (reference: losses_and_metrics.py:240-243), plus behavior of the
full matching loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from boosted_detr_tpu.config import LossWeights
from boosted_detr_tpu.ops import matching


def _oracle_mask(cost, num_objects):
    masks = np.zeros_like(cost)
    for i in range(cost.shape[0]):
        n = int(num_objects[i])
        if n > 0:
            r, c = linear_sum_assignment(cost[i, :n, :])
            masks[i][r, c] = 1.0
    return masks


def _check_valid(mask, num_objects):
    b, o, p = mask.shape
    for i in range(b):
        n = int(num_objects[i])
        # each real object row assigned exactly once
        assert np.allclose(mask[i, :n].sum(axis=1), 1.0), mask[i]
        # pad rows all zero
        assert np.allclose(mask[i, n:], 0.0)
        # each prediction used at most once
        assert np.all(mask[i].sum(axis=0) <= 1.0 + 1e-6)


# --- exact on-device Hungarian ----------------------------------------------


@pytest.mark.parametrize("b,o,p", [(4, 8, 16), (2, 25, 25), (3, 1, 96),
                                   (8, 32, 96)])
def test_hungarian_exact_optimal(rng, b, o, p):
    cost = rng.uniform(0, 10, size=(b, o, p)).astype(np.float32)
    num_objects = rng.integers(0, o + 1, size=(b,)).astype(np.int32)
    mask = np.asarray(matching.hungarian_lap(jnp.asarray(cost),
                                             jnp.asarray(num_objects)))
    _check_valid(mask, num_objects)
    oracle = _oracle_mask(cost, num_objects)
    # exact optimum: total assigned cost equals scipy's (ties may differ)
    assert np.isclose((mask * cost).sum(), (oracle * cost).sum(),
                      rtol=1e-5, atol=1e-4)


def test_hungarian_negative_and_large_costs(rng):
    # DETR cost surfaces mix scales (1000-weighted category, 500-scale box)
    b, o, p = 4, 32, 96
    cost = (1000 * rng.uniform(0, 0.09, size=(b, o, p))
            + rng.uniform(0, 2000, size=(b, o, p)) * 0.01
            - 100 * rng.uniform(0, 0.3, size=(b, o, p))).astype(np.float32)
    num_objects = rng.integers(1, o + 1, size=(b,)).astype(np.int32)
    mask = np.asarray(matching.hungarian_lap(jnp.asarray(cost),
                                             jnp.asarray(num_objects)))
    _check_valid(mask, num_objects)
    oracle = _oracle_mask(cost, num_objects)
    assert np.isclose((mask * cost).sum(), (oracle * cost).sum(),
                      rtol=1e-5, atol=1e-3)


def test_hungarian_zero_objects():
    cost = jnp.ones((2, 4, 6))
    mask = np.asarray(matching.hungarian_lap(cost, jnp.array([0, 0])))
    assert np.allclose(mask, 0.0)


def test_hungarian_jittable(rng):
    cost = jnp.asarray(rng.uniform(0, 1, size=(2, 4, 8)).astype(np.float32))
    n = jnp.array([3, 4], jnp.int32)
    jitted = jax.jit(matching.hungarian_lap)
    mask = np.asarray(jitted(cost, n))
    _check_valid(mask, np.asarray(n))
    oracle = _oracle_mask(np.asarray(cost), np.asarray(n))
    assert np.isclose((mask * np.asarray(cost)).sum(), (oracle * np.asarray(cost)).sum(),
                      rtol=1e-5)


def test_hungarian_no_gradient(rng):
    # assignment must be a stop-gradient boundary (reference parity: the mask
    # comes from tf.numpy_function and carries no gradient)
    cost = jnp.asarray(rng.uniform(0, 1, size=(1, 3, 5)).astype(np.float32))
    n = jnp.array([3], jnp.int32)

    def f(c):
        return jnp.sum(matching.hungarian_lap(c, n) * c)

    g = jax.grad(f)(cost)
    mask = matching.hungarian_lap(cost, n)
    assert np.allclose(np.asarray(g), np.asarray(mask))  # only direct term


# --- approximate auction -----------------------------------------------------


@pytest.mark.parametrize("b,o,p", [(4, 8, 16), (8, 32, 96)])
def test_auction_eps_optimal(rng, b, o, p):
    cost = rng.uniform(0, 10, size=(b, o, p)).astype(np.float32)
    num_objects = rng.integers(0, o + 1, size=(b,)).astype(np.int32)
    mask = np.asarray(matching.auction_lap(jnp.asarray(cost),
                                           jnp.asarray(num_objects),
                                           eps_rel=1e-2))
    _check_valid(mask, num_objects)
    oracle = _oracle_mask(cost, num_objects)
    # within n * eps of optimal, eps = eps_rel * spread / (n+1)
    spread = cost.max() - cost.min()
    slack = 1e-2 * spread + 1e-3
    assert (mask * cost).sum() <= (oracle * cost).sum() + slack * b


def test_auction_exact_on_separated_costs(rng):
    # When the optimum is unique and well-separated, auction must equal scipy.
    b, o, p = 3, 6, 10
    cost = rng.uniform(0, 1, size=(b, o, p)).astype(np.float32)
    for i in range(b):
        perm = rng.permutation(p)[:o]
        cost[i, np.arange(o), perm] -= 100.0
    num_objects = np.full((b,), o, np.int32)
    mask = np.asarray(matching.auction_lap(jnp.asarray(cost),
                                           jnp.asarray(num_objects)))
    assert np.allclose(mask, _oracle_mask(cost, num_objects))


def test_hungarian_host_matches_oracle(rng):
    cost = rng.uniform(0, 5, size=(3, 5, 9)).astype(np.float32)
    n = np.array([5, 2, 0], np.int32)
    mask = np.asarray(matching.hungarian_host(jnp.asarray(cost), jnp.asarray(n)))
    assert np.allclose(mask, _oracle_mask(cost, n))


# --- full matching loss -----------------------------------------------------


def _toy_batch(rng, b=2, o=4, p=6, vc=8, va=5):
    cat_ids = rng.integers(1, vc, size=(b, o))
    category = np.eye(vc, dtype=np.float32)[cat_ids]
    attribute = rng.integers(0, 2, size=(b, o, va)).astype(np.float32)
    bbox = rng.uniform(0.05, 0.4, size=(b, o, 4)).astype(np.float32)
    num_objects = np.array([o, o - 2], np.int32)[:b]
    cat_preds = rng.uniform(0.01, 1, size=(b, p, vc)).astype(np.float32)
    cat_preds /= cat_preds.sum(-1, keepdims=True)
    att_preds = rng.uniform(0.01, 0.99, size=(b, p, va)).astype(np.float32)
    box_preds = rng.uniform(0.05, 0.4, size=(b, p, 4)).astype(np.float32)
    return (category, attribute, bbox, num_objects,
            cat_preds, att_preds, box_preds)


def test_matching_loss_shapes_and_finite(rng):
    batch = _toy_batch(rng)
    losses, metrics = matching.matching_loss(*map(jnp.asarray, batch))
    for k in ("total", "category", "attribute", "box", "exist"):
        assert losses[k].shape == (2,)
        assert np.all(np.isfinite(np.asarray(losses[k])))
    assert np.all(np.isfinite(np.asarray(metrics["iou"])))
    total = np.asarray(losses["total"])
    parts = sum(np.asarray(losses[k])
                for k in ("category", "attribute", "box", "exist"))
    assert np.allclose(total, parts, rtol=1e-5)


def test_matching_loss_perfect_predictions_low(rng):
    # place predictions exactly on targets -> matched terms near zero
    b, o, p, vc, va = 1, 3, 5, 6, 4
    cat_ids = np.array([[1, 2, 3]])
    category = np.eye(vc, dtype=np.float32)[cat_ids]
    attribute = np.zeros((b, o, va), np.float32)
    attribute[..., 1] = 1.0
    bbox = rng.uniform(0.1, 0.4, size=(b, o, 4)).astype(np.float32)
    num_objects = np.array([o], np.int32)

    cat_preds = np.full((b, p, vc), 0.001, np.float32)
    cat_preds[:, :, 0] = 0.999  # unmatched preds confident "no object"
    for i in range(o):
        cat_preds[0, i] = 0.001
        cat_preds[0, i, cat_ids[0, i]] = 0.999
    att_preds = np.full((b, p, va), 0.001, np.float32)
    att_preds[:, :o, 1] = 0.999
    box_preds = np.concatenate(
        [bbox, rng.uniform(0.5, 0.9, size=(b, p - o, 4)).astype(np.float32)],
        axis=1)

    losses_good, _ = matching.matching_loss(
        *map(jnp.asarray, (category, attribute, bbox, num_objects,
                           cat_preds, att_preds, box_preds)))

    # now scramble the boxes -> loss must increase
    box_bad = rng.uniform(0.5, 0.9, size=(b, p, 4)).astype(np.float32)
    losses_bad, _ = matching.matching_loss(
        *map(jnp.asarray, (category, attribute, bbox, num_objects,
                           cat_preds, att_preds, box_bad)))
    assert float(losses_good["total"][0]) < float(losses_bad["total"][0])
    assert float(losses_good["box"][0]) < 1.0


def test_matching_loss_matcher_backends_agree(rng):
    batch = _toy_batch(rng)
    args = list(map(jnp.asarray, batch))
    l_device, _ = matching.matching_loss(*args, matcher="hungarian")
    l_host, _ = matching.matching_loss(*args, matcher="hungarian_host")
    # both exact -> identical losses up to fp noise / tie-breaking
    assert np.allclose(np.asarray(l_device["total"]),
                       np.asarray(l_host["total"]), rtol=1e-4)


def test_matching_loss_classification_only(rng):
    batch = _toy_batch(rng)
    w = LossWeights(box=0.0)
    losses, _ = matching.matching_loss(*map(jnp.asarray, batch), weights=w)
    assert np.allclose(np.asarray(losses["box"]), 0.0)


def test_greedy_matcher_valid_and_reasonable(rng):
    """Greedy matcher (the reference author's sketch, working): valid
    assignment, cost within a loose factor of optimal on random inputs."""
    b, o, p = 4, 8, 24
    cost = rng.uniform(0, 10, size=(b, o, p)).astype(np.float32)
    num_objects = rng.integers(0, o + 1, size=(b,)).astype(np.int32)
    mask = np.asarray(matching.greedy_lap(jnp.asarray(cost),
                                          jnp.asarray(num_objects)))
    _check_valid(mask, num_objects)
    oracle = _oracle_mask(cost, num_objects)
    assert (mask * cost).sum() <= 2.0 * (oracle * cost).sum() + 1.0


def test_greedy_matcher_shuffled(rng):
    cost = rng.uniform(0, 1, size=(2, 4, 8)).astype(np.float32)
    n = np.array([4, 3], np.int32)
    mask = np.asarray(matching.greedy_lap(
        jnp.asarray(cost), jnp.asarray(n),
        shuffle_key=jax.random.PRNGKey(0)))
    _check_valid(mask, n)
