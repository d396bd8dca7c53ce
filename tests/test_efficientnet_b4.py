"""Faithful EfficientNetB4 (VERDICT r3 missing #3 / next-round #8): the
reference's default backbone is keras ``EfficientNetB4(include_top=False,
weights=None)`` (reference backbone.py:28-31). Pins our Flax implementation
to the published keras B4 architecture: exact total parameter count,
stride-32 feature contract at the B4 native resolution, compound-scaling
arithmetic, and the SE/swish block structure the lite variant omits."""

import jax
import jax.numpy as jnp
import numpy as np

from boosted_detr_tpu.models import backbone as backbone_lib

# keras EfficientNetB4(include_top=False).count_params() — trainable +
# non-trainable (BatchNorm moving stats), the architecture's fingerprint.
KERAS_B4_TOTAL_PARAMS = 17_673_823
# keras counts its input Normalization layer's adapt state (mean[3] +
# variance[3] + count[1] = 7 non-trainable scalars) in that total; in this
# framework input normalization is functional preprocessing
# (EncoderBackbone/_preprocess_affine), not parameters.
KERAS_INPUT_NORMALIZATION_PARAMS = 7


def _shapes(width=1.4, depth=1.8, image=380):
    net = backbone_lib.EfficientNetBackbone(width=width, depth=depth)
    return net, jax.eval_shape(
        lambda k, x: net.init(k, x, train=False), jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, image, image, 3), jnp.float32))


def _count(tree):
    return int(sum(np.prod(l.shape) for l in jax.tree.leaves(tree)))


def test_b4_total_param_count_matches_keras():
    _, v = _shapes()
    total = _count(v["params"]) + _count(v["batch_stats"])
    expected = KERAS_B4_TOTAL_PARAMS - KERAS_INPUT_NORMALIZATION_PARAMS
    assert total == expected, (
        f"params {_count(v['params'])} + stats {_count(v['batch_stats'])} "
        f"= {total}, expected keras B4 {expected}")


def test_b4_feature_contract_and_block_count():
    net, v = _shapes()
    out = jax.eval_shape(
        lambda p, x: net.apply(p, x, train=False),
        v, jax.ShapeDtypeStruct((2, 380, 380, 3), jnp.float32))
    # keras B4 no-top output at 380px: (12, 12, 1792)
    assert out.shape == (2, 12, 12, 1792)
    blocks = [k for k in v["params"] if k.startswith("stage")]
    assert len(blocks) == 32  # B4 round_repeats: 2+4+4+6+6+8+2

    # B4 stage widths after round_filters (keras block summary)
    last = {k.split("_block")[0]: k for k in sorted(blocks)}
    widths = {s: v["params"][k]["project"]["conv"]["kernel"].shape[-1]
              for s, k in last.items()}
    assert widths == {"stage0": 24, "stage1": 32, "stage2": 56,
                      "stage3": 112, "stage4": 160, "stage5": 272,
                      "stage6": 448}
    # stem 48, head 1792
    assert v["params"]["stem"]["conv"]["kernel"].shape[-1] == 48
    assert v["params"]["head"]["conv"]["kernel"].shape[-1] == 1792
    # SE present with input-relative reduction: stage1 block0 input is 24ch
    se = v["params"]["stage1_block0"]["se"]
    assert se["reduce"]["kernel"].shape[-1] == 6  # int(24 * 0.25)
    assert se["expand"]["kernel"].shape[-1] == 24 * 6  # expanded width


def test_rounding_rules_match_keras():
    rf = backbone_lib._round_filters
    rr = backbone_lib._round_repeats
    assert [rf(f, 1.4) for f in (32, 16, 24, 40, 80, 112, 192, 320, 1280)] \
        == [48, 24, 32, 56, 112, 160, 272, 448, 1792]
    assert [rr(r, 1.8) for r in (1, 2, 3, 4)] == [2, 4, 6, 8]
    # divisor snap-up rule: 0.9 guard
    assert rf(8, 1.1) == 8  # 8.8 -> 8 (>= 7.92)


def test_b4_forward_runs_and_is_finite():
    net = backbone_lib.EfficientNetBackbone()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)),
                    jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(v, x, train=False)
    assert y.shape == (1, 2, 2, 1792)
    assert bool(jnp.isfinite(y).all())
    # train path (stochastic depth needs the dropout rng)
    y2, _ = net.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert bool(jnp.isfinite(y2).all())


def test_b4_wires_into_encoder_backbone():
    net = backbone_lib.EncoderBackbone(backbone="efficientnet_b4")
    out = jax.eval_shape(
        lambda k, x: net.init(k, x, train=False), jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    assert "effnet_b4" in out["params"]
