"""Early-exit (adaptive-depth) inference.

The reference's README describes this as a design goal but never implements
it (reference README.md:9, :63-88: emit predictions from an earlier decoder
block once they are confident enough). Two TPU-appropriate modes:

1. ``adaptive_select`` / ``stability_select`` — per-image adaptive depth
   inside ONE jitted graph: all decoder blocks run (static shapes,
   XLA-friendly), then each image selects its exit block. Output-equivalent
   to true early exit; no data-dependent control flow.
2. ``make_incremental_predict`` — actual compute saving: per-block jitted
   stage functions driven from the host; a batch stops descending the
   decoder stack once every image in it meets the exit criterion. Useful
   for serving where latency matters and batches are small.

Two exit criteria:

- ``confidence`` (the reference README's sketch): exit once the per-image
  confidence clears a threshold. Measured round 4: this CANNOT order the
  boosted ensemble's cumulative outputs — each added softmax spreads class
  mass, so class-sum-normalized confidence monotonically DECREASES with
  depth (0.96 -> 0.52 -> 0.41 -> 0.33 on the val-suite checkpoint) and
  every image exits at block 0 for any threshold <= 0.9.
- ``stability`` (PABEE-style; Zhou et al. 2020): exit once adding the next
  weak learner stops CHANGING the prediction. This is the natural criterion
  for a gradient-boosted ensemble — later blocks are trained to predict
  residual corrections, so a small inter-block delta literally means the
  boosting residual has converged for this image.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def block_confidence(preds: Dict[str, jnp.ndarray],
                     pad_id: int = 0) -> jnp.ndarray:
    """Per-image confidence: object-ness-weighted mean of the per-slot max
    class probability. Each slot contributes with weight ``1 - p_PAD`` (its
    probability of being an object), so a slot that confidently predicts
    no-object vanishes from the mean, while an UNDECIDED slot (PAD barely
    winning) still drags confidence down. An image whose every slot is
    certain-PAD is maximally confident — there is nothing left to refine.

    Down-weighting confident-PAD slots matters: a trained DETR assigns ~90
    of 96 slots to no-object at >0.99 probability from the very first
    block, so an unweighted mean over ALL slots is ~1 regardless of how
    unsettled the actual detections are — measured on the round-4 sweep,
    every image exited at block 0 for every threshold up to 0.95
    (benchmarks/RESULTS.md).

    The max is normalized by the class-sum: for plain softmax outputs
    (sum = 1) that is the max probability unchanged, and for the boosted
    model's CUMULATIVE outputs (block k sums k softmaxes, so the class-sum
    is ~k) it makes one threshold comparable across exit depths — without
    the normalization every deep block trivially clears any threshold."""
    cat = preds["category"].astype(jnp.float32)  # [B, P, Vc]
    total = jnp.sum(cat, axis=-1, keepdims=True)  # 1 softmax / ~k boosted
    probs = cat / jnp.maximum(total, 1e-9)
    maxp = jnp.max(probs, axis=-1)  # [B, P]
    obj_w = 1.0 - probs[..., pad_id]  # [B, P] P(slot is an object)
    w_sum = jnp.sum(obj_w, axis=-1)  # [B]
    conf = jnp.sum(obj_w * maxp, axis=-1) / jnp.maximum(w_sum, 1e-6)
    return jnp.where(w_sum > 1e-3, conf, jnp.ones_like(conf))


def prediction_delta(prev: Dict[str, jnp.ndarray],
                     cur: Dict[str, jnp.ndarray],
                     pad_id: int = 0) -> jnp.ndarray:
    """Per-image change between two consecutive blocks' cumulative
    predictions: object-weighted mean over slots of (class TV distance +
    mean |box move|), [B].

    The boosted loss trains the CUMULATIVE sums at every depth against the
    targets (boosted_model.py:232-243), so the inter-block box delta is the
    newest weak learner's residual in box units directly; class sums are
    normalized by their class-sum before the total-variation distance so
    the scale-k cumulative softmax sums compare as distributions. Slots are
    weighted by P(object) under the NEW block (same rationale as
    :func:`block_confidence`: a slot both blocks call no-object should not
    make the image look "stable" about its detections)."""
    def norm(p):
        c = p["category"].astype(jnp.float32)
        return c / jnp.maximum(jnp.sum(c, axis=-1, keepdims=True), 1e-9)

    p0, p1 = norm(prev), norm(cur)
    tv = 0.5 * jnp.sum(jnp.abs(p1 - p0), axis=-1)  # [B, P] in [0, 1]
    box = jnp.mean(jnp.abs(cur["boxes"].astype(jnp.float32)
                           - prev["boxes"].astype(jnp.float32)),
                   axis=-1)  # [B, P]
    obj_w = 1.0 - p1[..., pad_id]  # [B, P]
    w_sum = jnp.sum(obj_w, axis=-1)  # [B]
    delta = jnp.sum(obj_w * (tv + box), axis=-1) / jnp.maximum(w_sum, 1e-6)
    return jnp.where(w_sum > 1e-3, delta, jnp.zeros_like(delta))


def _normalize_category(preds: Dict[str, jnp.ndarray]
                        ) -> Dict[str, jnp.ndarray]:
    """Renormalize the category output to a proper per-slot distribution.

    Required for MIXED-depth batches: COCO mAP ranks detections across
    images by score, and the boosted ensemble's cumulative sums at exit
    depth k live on a ~k scale — mixing depths without renormalizing
    corrupts the cross-image ranking (measured on the scaled boosted
    checkpoint: pure block-0 exits score val mAP50 0.60, pure full-depth
    0.51, but a 42/22 block-0/block-3 MIX scored 0.41 before this fix).
    For plain softmax outputs (class-sum already 1) this is the identity."""
    cat = preds["category"].astype(jnp.float32)
    total = jnp.maximum(jnp.sum(cat, axis=-1, keepdims=True), 1e-9)
    out = dict(preds)
    out["category"] = cat / total
    return out


def _gather_at(outputs: List[Dict[str, jnp.ndarray]],
               exit_block: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-image gather of each key at its exit block (one-hot einsum —
    static shapes, no dynamic slicing), category renormalized for
    cross-image score comparability."""
    n = len(outputs)

    def gather(key):
        stacked = jnp.stack([o[key] for o in outputs], axis=0)  # [N, B, ...]
        onehot = jax.nn.one_hot(exit_block, n, dtype=stacked.dtype)  # [B, N]
        return jnp.einsum("bn,nb...->b...", onehot, stacked)

    return _normalize_category({k: gather(k) for k in outputs[0]})


def adaptive_select(outputs: List[Dict[str, jnp.ndarray]],
                    threshold: float) -> Tuple[Dict[str, jnp.ndarray],
                                               jnp.ndarray]:
    """Select, per image, the earliest block whose confidence >= threshold
    (falling back to the last block). Returns (preds, exit_block [B])."""
    n = len(outputs)
    confs = jnp.stack([block_confidence(o) for o in outputs], axis=0)  # [N,B]
    passed = confs >= threshold  # [N, B]
    # earliest passing index, else last
    idx = jnp.argmax(passed, axis=0)  # first True (0 if none True)
    any_passed = jnp.any(passed, axis=0)
    exit_block = jnp.where(any_passed, idx, n - 1)  # [B]
    return _gather_at(outputs, exit_block), exit_block


def stability_select(outputs: List[Dict[str, jnp.ndarray]],
                     tau: float) -> Tuple[Dict[str, jnp.ndarray],
                                          jnp.ndarray]:
    """Select, per image, the earliest block k >= 1 whose delta from block
    k-1 is <= tau (falling back to the last block). ``tau=0.0`` degenerates
    to full depth. Returns (preds, exit_block [B])."""
    n = len(outputs)
    if n == 1:
        b = outputs[0]["category"].shape[0]
        return _normalize_category(outputs[0]), jnp.zeros((b,), jnp.int32)
    deltas = jnp.stack([prediction_delta(outputs[k - 1], outputs[k])
                        for k in range(1, n)], axis=0)  # [N-1, B]
    stable = deltas <= tau  # [N-1, B]
    idx = jnp.argmax(stable, axis=0) + 1  # first stable pair -> its block k
    any_stable = jnp.any(stable, axis=0)
    exit_block = jnp.where(any_stable, idx, n - 1)  # [B]
    return _gather_at(outputs, exit_block), exit_block


def _make_stop_check(threshold: float, criterion: str):
    """Host-side batch stop test for the incremental mode. ``confidence``
    stops once every image's confidence >= threshold; ``stability`` stops
    once every image's inter-block delta <= threshold (never at block 0 —
    a delta needs a predecessor)."""
    if criterion not in ("confidence", "stability"):
        raise ValueError(f"unknown early-exit criterion: {criterion!r}")
    conf_j = jax.jit(block_confidence)
    delta_j = jax.jit(prediction_delta)

    def should_stop(prev, preds):
        import numpy as np

        if criterion == "stability":
            if prev is None:
                return False
            return bool((np.asarray(delta_j(prev, preds)) <= threshold)
                        .all())
        return bool((np.asarray(conf_j(preds)) >= threshold).all())

    return should_stop


def make_incremental_predict(model, threshold: float,
                             criterion: str = "confidence"):
    """Host-driven early exit with real compute saving.

    Returns predict(variables, image) -> (preds, blocks_run). Stages:
    encode once; then per decoder block a separate jitted step; stop as soon
    as every image in the batch meets the exit criterion. Dispatches on the
    model family: the boosted ensemble stages per weak learner (its encoder
    is per block), standard DETR stages per decoder block over one encode.
    """
    from boosted_detr_tpu.models.boosted import BoostedDETR

    if isinstance(model, BoostedDETR):
        return _make_incremental_boosted(model, threshold, criterion)

    @jax.jit
    def encode(variables, image):
        def run(mdl, image):
            tokens, pos = mdl.encode(image, train=False)
            return mdl.decoder_prep(tokens, pos)

        return model.apply(variables, image, method=run)

    def make_block_step(i):
        @jax.jit
        def step(variables, enc_value, dec, enc_key):
            def run(mdl, enc_value, dec, enc_key):
                dec2 = mdl.decoder_blocks[i](enc_value, dec, enc_key,
                                             deterministic=True)
                return dec2, mdl.apply_heads(dec2, train=False)

            return model.apply(variables, enc_value, dec, enc_key,
                               method=run)

        return step

    steps = [make_block_step(i)
             for i in range(model.config.num_decoder_blocks)]

    should_stop = _make_stop_check(threshold, criterion)

    def predict(variables, image):
        enc_value, dec, enc_key, _ = encode(variables, image)
        preds = prev = None
        blocks_run = 0
        for step in steps:
            dec, preds = step(variables, enc_value, dec, enc_key)
            blocks_run += 1
            if should_stop(prev, preds):
                break
            prev = preds
        return _normalize_category(preds), blocks_run

    return predict


def _make_incremental_boosted(model, threshold: float,
                              criterion: str = "confidence"):
    """Boosted-ensemble staging: the weak learner (encoder_i + decoder_i +
    heads_i) IS the exit unit (reference README.md:63-88 designs early exit
    exactly for this ensemble); each stage adds its block's predictions to
    the cumulative sums (boosted_model.py:222-229 semantics, fixed
    double-count by default)."""

    @jax.jit
    def backbone_neck(variables, image):
        def run(mdl, image):
            return mdl.neck(mdl.backbone(image, train=False), train=False)

        return model.apply(variables, image, method=run)

    def make_block_step(i):
        @jax.jit
        def step(variables, grid, sums):
            def run(mdl, grid, sums):
                b, r, c, d = grid.shape
                tokens, pos = mdl.encoders[i](grid, deterministic=True)
                enc_value, dec, enc_key, _ = mdl.decoder_prep(tokens, pos)
                dec = mdl.decoder_blocks[i](enc_value, dec, enc_key,
                                            deterministic=True)
                out = {"category": mdl.category_heads[i](dec, train=False),
                       "attribute": mdl.attribute_heads[i](dec, train=False),
                       "boxes": mdl.box_heads[i](dec, train=False)}
                if sums is not None:
                    out = {k: sums[k] + v for k, v in out.items()}
                elif mdl.config.block0_double_count:
                    out = {k: 2 * v for k, v in out.items()}
                return tokens.reshape(b, r, c, d), out

            return model.apply(variables, grid, sums, method=run)

        return step

    steps = [make_block_step(i)
             for i in range(model.config.num_decoder_blocks)]

    should_stop = _make_stop_check(threshold, criterion)

    def predict(variables, image):
        grid = backbone_neck(variables, image)
        sums = prev = None
        blocks_run = 0
        for step in steps:
            grid, sums = step(variables, grid, sums)
            blocks_run += 1
            if should_stop(prev, sums):
                break
            prev = sums
        return _normalize_category(sums), blocks_run

    return predict
