"""Pallas LAP kernel tests (interpret mode on CPU; the compiled path is
exercised on real TPU by the verify drives)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from boosted_detr_tpu.ops.pallas_lap import hungarian_lap_pallas


@pytest.mark.parametrize("b,o,p", [(2, 4, 8), (3, 8, 16), (4, 32, 96)])
def test_pallas_lap_exact(rng, b, o, p):
    cost = rng.uniform(0, 10, size=(b, o, p)).astype(np.float32)
    n = rng.integers(0, o + 1, size=(b,)).astype(np.int32)
    mask = np.asarray(hungarian_lap_pallas(jnp.asarray(cost),
                                           jnp.asarray(n), interpret=True))
    for i in range(b):
        ni = int(n[i])
        assert np.allclose(mask[i, ni:], 0.0)
        if ni:
            assert np.allclose(mask[i, :ni].sum(1), 1.0)
            r, c = linear_sum_assignment(cost[i, :ni, :])
            assert np.isclose((mask[i] * cost[i]).sum(),
                              cost[i][r, c].sum(), rtol=1e-5, atol=1e-3)


def test_pallas_lap_mixed_scales(rng):
    b, o, p = 2, 16, 32
    cost = (1000 * rng.uniform(0, 0.09, (b, o, p))
            - 50 * rng.uniform(0, 1, (b, o, p))).astype(np.float32)
    n = np.array([16, 7], np.int32)
    mask = np.asarray(hungarian_lap_pallas(jnp.asarray(cost),
                                           jnp.asarray(n), interpret=True))
    for i in range(b):
        ni = int(n[i])
        r, c = linear_sum_assignment(cost[i, :ni, :])
        assert np.isclose((mask[i] * cost[i]).sum(), cost[i][r, c].sum(),
                          rtol=1e-5, atol=1e-3)


def test_matcher_dispatch_pallas(rng):
    from boosted_detr_tpu.ops import matching

    cost = jnp.asarray(rng.uniform(0, 1, (2, 4, 8)).astype(np.float32))
    n = jnp.asarray(np.array([4, 2], np.int32))
    # CPU tests run the interpret path implicitly? No: dispatch compiles; on
    # CPU backend pallas_call falls back to interpret-capable lowering only
    # if supported — so call the kernel directly in interpret mode and the
    # XLA backend through dispatch for agreement.
    m_x = np.asarray(matching.solve_matching(cost, n, "hungarian"))
    m_p = np.asarray(hungarian_lap_pallas(cost, n, interpret=True))
    c = np.asarray(cost)
    assert np.isclose((m_x * c).sum(), (m_p * c).sum(), rtol=1e-5)
