"""Direct numerical parity against the REFERENCE'S OWN TensorFlow code.

These tests import the read-only reference modules from
/root/reference/ModelComponents and compare their outputs against this
framework's, with identical inputs and (where applicable) identical weights.
The reference's ``tensorflow_addons`` dependency is not installed, so a stub
implementing tfa's giou_loss / SigmoidFocalCrossEntropy formulas in plain TF
is registered first — every OTHER line executed (cost broadcasting, masking,
normalization, existence loss, scipy assignment, attention plumbing) is the
reference's literal code.
"""

import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF = "/root/reference/ModelComponents"


def _install_tfa_stub():
    if "tensorflow_addons" in sys.modules:
        return  # a real installation exists; leave it alone
    tfa = types.ModuleType("tensorflow_addons")
    losses_mod = types.ModuleType("tensorflow_addons.losses")

    def giou_loss(y_true, y_pred, mode="giou"):
        # corner format [ymin, xmin, ymax, xmax]
        t, p = tf.cast(y_true, tf.float32), tf.cast(y_pred, tf.float32)

        def area(b):
            return (tf.maximum(b[..., 2] - b[..., 0], 0)
                    * tf.maximum(b[..., 3] - b[..., 1], 0))

        i_min = tf.maximum(t[..., :2], p[..., :2])
        i_max = tf.minimum(t[..., 2:], p[..., 2:])
        inter = (tf.maximum(i_max[..., 0] - i_min[..., 0], 0)
                 * tf.maximum(i_max[..., 1] - i_min[..., 1], 0))
        union = area(t) + area(p) - inter
        iou = tf.math.divide_no_nan(inter, union)
        if mode == "iou":
            return 1.0 - iou
        e_min = tf.minimum(t[..., :2], p[..., :2])
        e_max = tf.maximum(t[..., 2:], p[..., 2:])
        enclose = (tf.maximum(e_max[..., 0] - e_min[..., 0], 0)
                   * tf.maximum(e_max[..., 1] - e_min[..., 1], 0))
        giou = iou - tf.math.divide_no_nan(enclose - union, enclose)
        return 1.0 - giou

    class SigmoidFocalCrossEntropy:
        def __init__(self, alpha=0.25, gamma=2.0, reduction=None,
                     from_logits=False):
            self.alpha, self.gamma = alpha, gamma

        def __call__(self, y_true, y_pred):
            y = tf.cast(y_true, tf.float32)
            p = tf.cast(y_pred, tf.float32)
            ce = tf.keras.backend.binary_crossentropy(y, p)
            p_t = y * p + (1 - y) * (1 - p)
            af = y * self.alpha + (1 - y) * (1 - self.alpha)
            mod = tf.pow(1.0 - p_t, self.gamma)
            return tf.reduce_sum(af * mod * ce, axis=-1)

    losses_mod.giou_loss = giou_loss
    losses_mod.SigmoidFocalCrossEntropy = SigmoidFocalCrossEntropy
    tfa.losses = losses_mod
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.losses"] = losses_mod


_REF_CACHE = {}


def _ref_module(name):
    """Load a reference module by FILE (no sys.path insertion — the reference
    dir is full of generically-named modules like transformers.py/datasets.py
    that would shadow real packages process-wide). The tfa stub is installed
    only around module exec and removed afterwards."""
    if name in _REF_CACHE:
        return _REF_CACHE[name]
    import importlib.util
    import os

    _install_tfa_stub()
    # Keras 3 compat: the reference targets TF2/Keras2's
    # layers.experimental.preprocessing namespace; StringLookup itself is
    # unchanged, only the attribute path moved.
    if not hasattr(tf.keras.layers, "experimental"):
        tf.keras.layers.experimental = types.SimpleNamespace(
            preprocessing=types.SimpleNamespace(
                StringLookup=tf.keras.layers.StringLookup))
    try:
        spec = importlib.util.spec_from_file_location(
            f"_reference_{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop("tensorflow_addons", None)
        sys.modules.pop("tensorflow_addons.losses", None)
    _REF_CACHE[name] = mod
    return mod


def test_matching_loss_matches_reference_exactly(rng):
    """The reference's MatchingLoss layer (its literal code, scipy matcher
    included) vs our matching_loss on identical inputs."""
    import jax.numpy as jnp

    from boosted_detr_tpu.config import LossWeights
    from boosted_detr_tpu.ops import matching

    lm = _ref_module("losses_and_metrics")

    b, o, p, vc, va = 2, 3, 5, 6, 4
    cat_ids = rng.integers(1, vc, size=(b, o))
    category = np.eye(vc, dtype=np.float32)[cat_ids]
    attribute = rng.integers(0, 2, size=(b, o, va)).astype(np.float32)
    bbox = rng.uniform(0.05, 0.4, size=(b, o, 4)).astype(np.float32)
    num_objects = np.array([[o], [o - 1]], np.int32)
    cat_preds = rng.uniform(0.01, 1, size=(b, p, vc)).astype(np.float32)
    cat_preds /= cat_preds.sum(-1, keepdims=True)
    att_preds = rng.uniform(0.01, 0.99, size=(b, p, va)).astype(np.float32)
    box_preds = rng.uniform(0.05, 0.4, size=(b, p, 4)).astype(np.float32)

    ref_layer = lm.MatchingLoss()

    # Keras 3 (this image's TF) rejects two Keras-2 idioms the reference
    # relies on: passing a loss FUNCTION positionally into a layer, and
    # implicit broadcasting inside BinaryCrossentropy. This shim reproduces
    # CostArray's documented behavior (losses_and_metrics.py:215-225,
    # including its commented-out `* tf.ones_like` broadcast) with explicit
    # broadcasting, then delegates to the reference loss functions untouched.
    def cost_array(y_true, y_pred, func):
        y_true = tf.expand_dims(y_true, axis=-2)
        y_pred = tf.expand_dims(y_pred, axis=-3)
        shape = tf.broadcast_static_shape(y_true.shape, y_pred.shape)
        return func(tf.broadcast_to(y_true, shape),
                    tf.broadcast_to(y_pred, shape))

    ref_layer.CostArray = cost_array
    ref_layer.MatchingMetric.CostArray = cost_array
    ref_losses, ref_metrics = ref_layer.call([
        [tf.constant(category), tf.constant(attribute), tf.constant(bbox),
         tf.constant(num_objects)],
        [tf.constant(cat_preds), tf.constant(att_preds),
         tf.constant(box_preds)]])
    ref_total, ref_cat, ref_att, ref_box, ref_exist = [
        np.asarray(x) for x in ref_losses]

    ours, our_metrics = matching.matching_loss(
        jnp.asarray(category), jnp.asarray(attribute), jnp.asarray(bbox),
        jnp.asarray(num_objects.reshape(-1)), jnp.asarray(cat_preds),
        jnp.asarray(att_preds), jnp.asarray(box_preds),
        weights=LossWeights(), matcher="hungarian")

    assert np.allclose(np.asarray(ours["category"]), ref_cat, rtol=1e-4), \
        (np.asarray(ours["category"]), ref_cat)
    assert np.allclose(np.asarray(ours["attribute"]), ref_att, rtol=1e-4)
    assert np.allclose(np.asarray(ours["box"]), ref_box, rtol=1e-4)
    assert np.allclose(np.asarray(ours["exist"]), ref_exist, rtol=1e-4)
    assert np.allclose(np.asarray(ours["total"]), ref_total, rtol=1e-4)

    # Reference IoU-metric quirks (documented divergences, not reproduced):
    # (a) MatchingLoss list-wraps MatchingMetric's output then reduce_sums
    #     over axes [1,2] of the [1,B,O,P] conversion, yielding a
    #     [1, num_preds]-shaped 'IOU' reduced over the wrong axes
    #     (losses_and_metrics.py:157-158 + :191);
    # (b) MatchingMetric feeds RAW COCO [x,y,w,h] boxes into the IoU formula
    #     without corner conversion (losses_and_metrics.py:188 — BoxLoss
    #     converts at :59-66, the metric does not).
    # Our metric is the intended masked IoU on corner-converted boxes.
    assert np.asarray(ref_metrics[0]).shape == (1, p)  # quirk (a) pinned
    assert np.all(np.isfinite(np.asarray(our_metrics["iou"])))


def test_mha_vs_reference_with_same_weights(rng):
    """The reference's hand-rolled Keras MultiheadAttention vs ours, weights
    transplanted.

    Documented reference BUG (not reproduced): the reference merges heads
    with a plain Reshape of [B, H, Tq, D] to [B, Tq, H*D] WITHOUT first
    transposing heads next to the feature axis (transformers.py:56-57,
    :100), which scrambles different tokens' head outputs together. This
    test pins the bug (a numpy reimplementation of the scrambled reshape
    reproduces the reference bit-for-bit) and verifies OUR implementation
    equals the standard transpose-then-merge formulation of the same
    weights."""
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.models.layers import MultiheadAttention

    transformers = _ref_module("transformers")

    b, tq, tk, dim, heads = 2, 5, 7, 16, 2
    hd = dim // heads
    q_in = rng.normal(size=(b, tq, dim)).astype(np.float32)
    kv_in = rng.normal(size=(b, tk, dim)).astype(np.float32)

    ref = transformers.MultiheadAttention(num_attention_heads=heads, dim=hd)
    ref_out = ref([tf.constant(q_in), tf.constant(kv_in),
                   tf.constant(kv_in)]).numpy()

    W = {k: (layer.kernel.numpy(), layer.bias.numpy()) for k, layer in {
        "q": ref.QueryProjection, "k": ref.KeyProjection,
        "v": ref.ValueProjection, "o": ref.OutputProjection}.items()}

    def np_mha(scrambled: bool):
        q = q_in @ W["q"][0] + W["q"][1]
        k = kv_in @ W["k"][0] + W["k"][1]
        v = kv_in @ W["v"][0] + W["v"][1]
        q = q.reshape(b, tq, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        out = probs @ v  # [B, H, Tq, hd]
        if scrambled:
            out = out.reshape(b, tq, heads * hd)  # the reference's raw view
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b, tq, heads * hd)
        return out @ W["o"][0] + W["o"][1]

    # (1) the bug is pinned: scrambled merge == reference output
    assert np.allclose(np_mha(scrambled=True), ref_out, atol=2e-5)
    # (2) ours == the standard formulation with the same weights
    ours = MultiheadAttention(num_heads=heads)
    new = {name: {"kernel": jnp.asarray(W[short][0]),
                  "bias": jnp.asarray(W[short][1])}
           for name, short in [("query_projection", "q"),
                               ("key_projection", "k"),
                               ("value_projection", "v"),
                               ("output_projection", "o")]}
    out = ours.apply({"params": new}, jnp.asarray(q_in), jnp.asarray(kv_in),
                     jnp.asarray(kv_in))
    assert np.allclose(np.asarray(out), np_mha(scrambled=False), atol=2e-5)


def test_positional_init_matches_reference(rng):
    """Our trig init vs the reference's ImageEncoderAttention variable.
    (The reference uses the removed ``np.math`` alias,
    transformers.py:286 — shimmed here so its original code runs.)"""
    import math

    from boosted_detr_tpu.models.layers import trig_positional_init

    transformers = _ref_module("transformers")
    if not hasattr(transformers.np, "math"):
        transformers.np.math = math  # numpy>=2 removed np.math

    enc = transformers.ImageEncoderAttention(num_blocks=1,
                                             num_attention_heads=2)
    x = tf.zeros((1, 3, 4, 8), tf.float32)
    enc([x])  # build
    ref_pos = enc.positional_encoding.numpy().reshape(12, 8)
    ours = trig_positional_init(12, 8)
    assert np.allclose(ours, ref_pos, atol=1e-5)


def test_box_head_activation_matches_reference(rng):
    """Expanded sigmoid 3*sig(x/100)-1 vs the reference layer's Lambda."""
    prediction_heads = _ref_module("prediction_heads")

    x = rng.normal(scale=50, size=(4, 6, 4)).astype(np.float32)
    head = prediction_heads.BoxPredictionHead(hidden_dim=8, num_preds=6)
    _ = head([tf.zeros((1, 6, 8))])  # build
    ref = head.Sigmoid(tf.constant(x)).numpy()
    ours = 3.0 / (1.0 + np.exp(-x / 100.0)) - 1.0
    assert np.allclose(ours, ref, atol=1e-6)


def test_tokenization_encode_matches_reference(rng):
    """TextCodec.encode_* + targets_from_batch vs the reference's literal
    Tokenization layer (tokenizers.py:40-82) on a randomized vocab: one-hot
    categories and PAD-bit multi-hot attributes must agree bit-for-bit."""
    import jax.numpy as jnp

    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.train import steps

    tokenizers = _ref_module("tokenizers")
    words = [f"w{i}_{c}" for i, c in enumerate("abcdefghij")]
    perm = rng.permutation(len(words))
    vocab = {"category": [words[i] for i in perm[:5]],
             "attribute": [words[i] for i in perm[5:]]}
    codec = TextCodec(vocab)

    b, o, w = 3, 4, 3
    cat_strings, att_strings = [], []
    pool_c = vocab["category"] + ["<PAD>", "not-in-vocab"]
    pool_a = vocab["attribute"] + ["<PAD>", "also-unknown"]
    for i in range(b):
        cat_strings.append([[pool_c[int(rng.integers(len(pool_c)))]]
                            for _ in range(o)])
        att_strings.append([[pool_a[int(rng.integers(len(pool_a)))]
                             for _ in range(w)] for _ in range(o)])

    ref_tok = tokenizers.Tokenization(vocab_dict=vocab)
    ref_cat, ref_att = ref_tok((tf.constant(cat_strings),
                                tf.constant(att_strings)))
    ref_cat = ref_cat.numpy()  # [B, O, Vc] (call() squeezes the word axis)
    ref_att = ref_att.numpy()  # [B, O, Va]

    batch = {
        "category_ids": jnp.asarray(codec.encode_categories(cat_strings, o)),
        "attribute_ids": jnp.asarray(
            codec.encode_attributes(att_strings, o, w)),
    }
    sizes = codec.vocab_size_dict()
    ours_cat, ours_att = steps.targets_from_batch(
        batch, sizes["category"], sizes["attributes"])
    assert np.array_equal(np.asarray(ours_cat), ref_cat)
    assert np.array_equal(np.asarray(ours_att), ref_att)


def test_inverse_tokenization_decode_matches_reference(rng):
    """TextCodec.decode vs the reference's literal InverseTokenization
    (tokenizers.py:122-156): argmax categories and >=0.5 multi-hot attribute
    strings (PAD/OOV stripped, comma-joined) must agree."""
    from boosted_detr_tpu.data.codec import TextCodec

    tokenizers = _ref_module("tokenizers")
    vocab = {"category": ["cat", "dog", "fox"],
             "attribute": ["red", "blue", "tall", "short"]}
    codec = TextCodec(vocab)
    sizes = codec.vocab_size_dict()
    b, p = 2, 5
    cat_probs = rng.uniform(size=(b, p, sizes["category"])).astype(np.float32)
    att_probs = rng.uniform(size=(b, p, sizes["attributes"])).astype(
        np.float32)
    # force edge cases: all-below-threshold, PAD/OOV bits above threshold,
    # PAD category argmax
    att_probs[0, 0] = 0.1
    att_probs[0, 1, 0] = 0.9  # PAD bit only
    att_probs[0, 2, 1] = 0.9  # OOV bit
    cat_probs[1, 0] = 0.0
    cat_probs[1, 0, 0] = 1.0  # PAD category wins

    ref_inv = tokenizers.InverseTokenization(vocab_dict=vocab)
    ref_cat, ref_att = ref_inv((tf.constant(cat_probs),
                                tf.constant(att_probs)))
    ref_cat = ref_cat.numpy().astype(str).squeeze(-1)  # [B, P]
    ref_att = ref_att.numpy().astype(str).squeeze(-1)  # [B, P]

    ours_cat, ours_att = codec.decode(cat_probs, att_probs)
    assert np.array_equal(ours_cat.astype(str), ref_cat)
    # Reference quirk (documented divergence): its regex cleanup
    # (tokenizers.py:148-156) leaves a TRAILING comma whenever the last
    # vocabulary attribute is absent but earlier ones are present (e.g.
    # 'red, blue, tall,'). Our codec emits the intended clean join; compare
    # modulo that artifact.
    for i in range(b):
        for j in range(p):
            assert ours_att[i, j] == ref_att[i, j].rstrip(", "), (
                i, j, ours_att[i, j], ref_att[i, j])
            # and the artifact is ONLY ever a trailing ', ' remnant
            assert ref_att[i, j].rstrip(", ") == ref_att[i, j].strip(", ")
