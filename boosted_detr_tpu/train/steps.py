"""Functional train/eval steps: the whole forward + cost + on-device matching
+ loss + backward + update compiles as ONE XLA program (the BASELINE.json
north star: nothing leaves HBM).

Replaces the reference's Keras ``train_step`` driving ``DETR.call`` with
internal ``add_loss`` (reference model.py:145-233) and its host Hungarian
round trip. Validation reuses the training path exactly like the reference
(``test_step = train_step``, model.py:235-236) minus the parameter update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from boosted_detr_tpu.config import LossWeights, ModelConfig, TrainConfig
from boosted_detr_tpu.ops import matching


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # shadow EMA of params (TrainConfig.ema_decay > 0), updated on-device
    # inside the train step; None when EMA is off (structurally absent, so
    # existing checkpoints/pytrees are unchanged)
    ema_params: Any = None

    @classmethod
    def create(cls, params, batch_stats, tx, ema: bool = False):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx,
                   ema_params=jax.tree_util.tree_map(jnp.copy, params)
                   if ema else None)


def with_ema_params(state: TrainState) -> TrainState:
    """The state with EMA weights swapped in as ``params`` (for eval or
    export). Raises if the state was created without EMA."""
    if state.ema_params is None:
        raise ValueError("this TrainState has no EMA shadow; set "
                         "TrainConfig.ema_decay > 0 before compile()")
    return state.replace(params=state.ema_params)


def clip_by_per_variable_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras ``clipnorm`` semantics: clip EACH gradient tensor by its own L2
    norm (NOT the global norm) — the reference trains with
    ``SGD(..., clipnorm=0.1)`` (DETR_COCO.ipynb cell 26)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return init_fn, update_fn


def make_optimizer(cfg: TrainConfig, d_model: int = 256,
                   trainable_mask=None) -> optax.GradientTransformation:
    """SGD(momentum, nesterov) + per-variable clipnorm + LR schedule
    (reference DETR_COCO.ipynb cell 26), or AdamW. ``trainable_mask`` (a
    params-shaped bool pytree) implements staged freezing without recompiling
    (replacing the reference's .trainable=False + recompile dance,
    Boosted_DETR_COCO.ipynb cell 30)."""
    from boosted_detr_tpu.train import schedules

    schedule = schedules.make_schedule(cfg.lr_schedule, cfg.learning_rate,
                                       cfg.warmup_steps, d_model)
    chain = [optax.GradientTransformation(*clip_by_per_variable_norm(
        cfg.clipnorm))] if cfg.clipnorm else []
    if cfg.agc_clip:
        # unit-wise ratio clip ||g|| <= agc_clip * ||w|| (NFNet AGC) — the
        # norm-free (skipinit) backbone's stabilizer. Applied to weight
        # MATRICES/kernels only (ndim >= 2), matching the NFNet recipe:
        # on zero-init scalars (skipinit's skip_gain) the ratio clip caps
        # the update at ~eps*clip forever, so an unmasked AGC freezes every
        # residual branch shut and the model never trains (measured:
        # val mAP50 0.014 vs 0.131 unclipped, benchmarks/RESULTS.md).
        chain.insert(0, optax.masked(
            optax.adaptive_grad_clip(cfg.agc_clip),
            lambda params: jax.tree_util.tree_map(
                lambda p: p.ndim >= 2, params)))
    if cfg.optimizer == "sgd":
        chain.append(optax.sgd(schedule, momentum=cfg.momentum,
                               nesterov=cfg.nesterov))
    elif cfg.optimizer == "adamw":
        chain.append(optax.adamw(schedule, weight_decay=cfg.weight_decay))
    else:
        raise ValueError(f"unknown optimizer '{cfg.optimizer}'")
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = apply_trainable_mask(tx, trainable_mask)
    return tx


def boosted_block_mask(params, k: int):
    """Trainable mask for staged boosting: only weak-learner block k's
    layers (encoder_k / decoder_block_k / *_head_k, plus the shared
    decoder_prep queries) train; everything else — including the backbone —
    freezes (the reference's stage recipe, Boosted_DETR_COCO.ipynb cell
    30)."""
    wanted = {f"encoder_{k}", f"decoder_block_{k}", f"category_head_{k}",
              f"attribute_head_{k}", f"box_head_{k}", "decoder_prep"}

    def decide(path, _):
        top = getattr(path[0], "key", None)
        return top in wanted

    return jax.tree_util.tree_map_with_path(decide, params)


def apply_trainable_mask(tx: optax.GradientTransformation,
                         trainable_mask) -> optax.GradientTransformation:
    """Wrap any optimizer so params where the mask is False get zero updates
    (staged freezing for user-supplied optimizers too)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask))


def targets_from_batch(batch: Dict[str, jnp.ndarray], num_categories: int,
                       num_attributes: int):
    """Device-side analogue of the reference's in-model Tokenization
    (reference model.py:157, tokenizers.py:40-82), operating on integer ids
    produced by the host codec: one-hot category [B,O,Vc] and multi-hot
    attributes [B,O,Va] (max over the padded attribute-word axis)."""
    category = jax.nn.one_hot(batch["category_ids"], num_categories,
                              dtype=jnp.float32)
    att_hot = jax.nn.one_hot(batch["attribute_ids"], num_attributes,
                             dtype=jnp.float32)  # [B,O,W,Va]
    attribute = jnp.max(att_hot, axis=2)
    return category, attribute


def compute_losses(preds_list, batch, cfg: ModelConfig,
                   weights: LossWeights, fold: bool = True
                   ) -> Tuple[jnp.ndarray, Dict]:
    """Matched loss accumulated over the given prediction blocks (one entry =
    final-block-only standard DETR, reference model.py:179; multiple entries
    = intermediate/boosted losses, boosted_model.py:232-243).

    With L > 1 blocks the L bipartite problems are FOLDED into one
    [L*B, O, P] ``matching_loss`` call: the pallas matcher solves all lanes
    of one kernel invocation in lockstep, so L*B problems cost roughly one
    solve instead of L sequential solves (ops/pallas_lap.py; the XLA matcher
    is a vmap and folds the same way). The per-block batch-global
    normalization ``1 + sum(n)`` (reference losses_and_metrics.py:144-150)
    is restored by rescaling with ``(1 + L*sum(n)) / (1 + sum(n))`` — same
    math as the sequential loop up to float re-association (the ``exist``
    term is normalized per-element by ``1 + P`` and needs no rescale).
    ``fold=False`` keeps the sequential reference path (parity-tested
    against the folded one in tests/test_round3_regressions.py)."""
    category, attribute = targets_from_batch(batch, cfg.num_categories,
                                             cfg.num_attributes)
    bbox = batch["bbox"].astype(jnp.float32)
    num_objects = batch["num_objects"]

    n_blocks = len(preds_list)
    if fold and n_blocks > 1:
        b = bbox.shape[0]
        tile = lambda x: jnp.concatenate([x] * n_blocks, axis=0)  # noqa: E731
        stacked = {k: jnp.concatenate([p[k] for p in preds_list], axis=0)
                   for k in ("category", "attribute", "boxes")}
        losses, mets = matching.matching_loss(
            tile(category), tile(attribute), tile(bbox), tile(num_objects),
            stacked["category"], stacked["attribute"], stacked["boxes"],
            weights=weights, matcher=cfg.matcher)
        sum_n = jnp.sum(num_objects).astype(jnp.float32)
        rescale = (1.0 + n_blocks * sum_n) / (1.0 + sum_n)
        acc = {k: v.reshape(n_blocks, b).sum(axis=0) for k, v in
               losses.items()}
        for k in ("category", "attribute", "box"):
            acc[k] = acc[k] * rescale
        acc["total"] = (acc["category"] + acc["attribute"] + acc["box"]
                        + acc["exist"])
        # reference reports the final block's metric
        metrics = {"iou": mets["iou"].reshape(n_blocks, b)[-1] * rescale}
    else:
        acc = None
        metrics = {}
        for preds in preds_list:
            losses, mets = matching.matching_loss(
                category, attribute, bbox, num_objects,
                preds["category"], preds["attribute"], preds["boxes"],
                weights=weights, matcher=cfg.matcher)
            acc = losses if acc is None else {
                k: acc[k] + losses[k] for k in losses}
            metrics = mets  # reference reports final block's metric
    # Keras add_loss parity: per-element losses are summed over the batch
    # (reference model.py:208 + Keras reduction).
    scalar = jnp.sum(acc["total"])
    aux = {f"loss_{k}": jnp.sum(v) for k, v in acc.items()}
    aux["iou"] = jnp.mean(metrics["iou"]) if metrics else jnp.float32(0)
    return scalar, aux


def make_update_step(loss_fn, ema_decay: float = 0.0) -> Callable:
    """Wrap a ``loss_fn(params, batch_stats, batch, rng) -> (loss, (aux,
    new_stats))`` into the standard gradient/optimizer update step (shared by
    the detection and panoptic step factories). ``ema_decay > 0`` also
    advances the state's EMA shadow (when the state carries one) in the same
    fused program — no extra dispatch, no host traffic."""

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   dropout_rng)
        with jax.named_scope("optimizer"):
            updates, new_opt = state.tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None and ema_decay > 0.0:
            with jax.named_scope("ema"):
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay
                    + p.astype(e.dtype) * (1.0 - ema_decay),
                    new_ema, new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  ema_params=new_ema)
        aux["loss"] = loss
        return new_state, aux

    return train_step


def resolve_loss_weights(model_cfg: ModelConfig,
                         train_cfg: TrainConfig) -> LossWeights:
    """classification_only zeroes the box weight (reference model.py:44-45)."""
    weights = train_cfg.loss_weights
    if model_cfg.classification_only:
        weights = dataclasses.replace(weights, box=0.0)
    return weights


def make_train_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig
                    ) -> Callable:
    """Build the jittable train step for a DETR-family model whose
    ``__call__(image, train, return_intermediate)`` returns prediction
    dict(s)."""
    weights = resolve_loss_weights(model_cfg, train_cfg)
    intermediate = train_cfg.use_intermediate_losses

    loss_block = train_cfg.train_block if intermediate else None
    if (loss_block is not None
            and hasattr(model, "focused_training_layer")
            and model.focused_training_layer is None):
        # staged boosted training STOPS the forward at the focused block
        # (reference boosted_model.py:171, :245-246) — later blocks are
        # strictly downstream of block k, so gradients are identical but the
        # stage-k step costs ~(k+1)/n of a full forward. The clone returns a
        # single output (the focused block's cumulative predictions).
        model = model.clone(
            focused_training_layer=min(loss_block,
                                       model.config.num_decoder_blocks - 1))

    def loss_fn(params, batch_stats, batch, dropout_rng):
        if train_cfg.freeze_bn_stats:
            # frozen-BN phase: normalize with the running averages and skip
            # the batch-stat reduction passes entirely (the 80px-activation
            # HBM traffic identified by benchmarks/roofline.py); params
            # still train. train=False also disables dropout — this mode is
            # for the dropout-0 protocol.
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=False,
                return_intermediate=intermediate)
            mutated = {"batch_stats": batch_stats}
        else:
            outs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=True, return_intermediate=intermediate,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng})
        preds_list = outs if intermediate else [outs]
        if loss_block is not None:
            # only the focused block's cumulative loss contributes; with a
            # focused model the list already holds just that block
            preds_list = [preds_list[min(loss_block, len(preds_list) - 1)]]
        loss, aux = compute_losses(preds_list, batch, model_cfg, weights)
        if (intermediate and train_cfg.intermediate_loss_avg
                and len(preds_list) > 1):
            # mean over blocks: single-block gradient scale (config.py)
            scale = 1.0 / len(preds_list)
            loss = loss * scale
            aux = {k: (v * scale if k.startswith("loss_") else v)
                   for k, v in aux.items()}
        return loss, (aux, mutated.get("batch_stats", {}))

    return make_update_step(loss_fn, ema_decay=train_cfg.ema_decay)


def make_eval_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig
                   ) -> Callable:
    """Validation = the training loss path without updates (reference
    test_step aliases train_step, model.py:235-236)."""
    weights = resolve_loss_weights(model_cfg, train_cfg)

    def eval_step(state: TrainState, batch):
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False)
        loss, aux = compute_losses([outs], batch, model_cfg, weights)
        aux["loss"] = loss
        return aux

    return eval_step


def make_predict_step(model) -> Callable:
    """Inference: raw probability/box outputs; the host codec turns them into
    text (reference model.py:226-233 does this in-graph with string ops —
    TPU-incompatible there, host-side here)."""

    def predict_step(state: TrainState, image):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, train=False)

    return predict_step
