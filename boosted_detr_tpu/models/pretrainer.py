"""Classifier pre-trainer sharing the DETR trunk.

Reference: ModelComponents/model_pretrainer.py — a multi-label image
classifier that aliases the base DETR's backbone/neck/encoder/decoder layers
(model_pretrainer.py:33-40) and adds its own MultiClassPredictionHead. Used
to pre-train detector weights on classification before detection training
(DETR_COCO.ipynb cells 26-32).

Weight sharing here is by module nesting: the pre-trainer owns a full
``DETR`` submodule (under params key 'detr'); ``transfer_to_detr`` /
``load_from_detr`` copy that subtree to/from a standalone detector's params —
the param-tree surgery equivalent of the reference's shared-layer aliasing
and its checkpoint interop (SURVEY §5.4).

Loss semantics (reference model_pretrainer.py:94-108): after EVERY decoder
block, apply the classifier head, take the max probability per class over
the prediction axis ('best of num_preds'), compute sigmoid focal CE summed
over classes, take the min over the singleton axis ('choose best
prediction'), and accumulate across blocks. No bipartite matching — this
path was already TPU-clean in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from boosted_detr_tpu.config import ModelConfig
from boosted_detr_tpu.models.detr import DETR
from boosted_detr_tpu.models.heads import MultiClassPredictionHead
from boosted_detr_tpu.ops import losses as loss_ops


class DETRMultiClassifier(nn.Module):
    """Multi-label classifier over the shared DETR trunk."""

    config: ModelConfig  # the BASE model's config
    num_classifier_classes: int  # pre-training vocab size (incl PAD/OOV)
    hidden_dim: int = 256

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        self.detr = DETR(cfg, name="detr")
        self.classifier_head = MultiClassPredictionHead(
            self.num_classifier_classes, self.hidden_dim,
            cfg.num_object_preds, cfg.norm, dtype, name="classifier_head")

    def __call__(self, image, *, train: bool = False,
                 return_intermediate: bool = False):
        cfg = self.config
        tokens, pos = self.detr.encode(image, train=train)
        enc_value, dec, enc_key, _ = self.detr.decoder_prep(tokens, pos)

        outputs: List[jnp.ndarray] = []
        n = cfg.num_decoder_blocks
        for i, block in enumerate(self.detr.decoder_blocks):
            dec = block(enc_value, dec, enc_key, deterministic=not train)
            if return_intermediate or i == n - 1:
                preds = self.classifier_head(dec, train=train)
                # best prob per class across prediction slots
                # (reference model_pretrainer.py:102)
                outputs.append(jnp.max(preds, axis=1, keepdims=True))
        return outputs if return_intermediate else outputs[-1]


def pretrain_loss(preds_list: List[jnp.ndarray],
                  category_ids: jnp.ndarray,
                  num_classes: int) -> Dict[str, jnp.ndarray]:
    """Reference model_pretrainer.py:69-108: y = multi-hot of categories
    present in the image; per block focal loss, summed over blocks; scalar =
    sum over batch (Keras add_loss parity). Also reports binary accuracy."""
    y_hot = jax.nn.one_hot(category_ids, num_classes,
                           dtype=jnp.float32)  # [B,O,Vc]
    y_multihot = jnp.max(y_hot, axis=1, keepdims=True)  # [B,1,Vc]

    total = 0.0
    for preds in preds_list:
        # tfa functional sigmoid_focal_crossentropy: elementwise focal summed
        # over the class axis
        focal = jnp.sum(
            loss_ops.sigmoid_focal_elementwise(y_multihot,
                                               preds.astype(jnp.float32)),
            axis=-1)  # [B,1]
        step_loss = jnp.min(focal, axis=1)  # [B]
        total = total + step_loss

    final = preds_list[-1]
    accuracy = jnp.mean(
        ((final >= 0.5).astype(jnp.float32) == y_multihot).astype(
            jnp.float32))
    return {"loss": jnp.sum(total), "accuracy": accuracy}


def make_pretrain_step(model: DETRMultiClassifier):
    """Jittable pre-training step (always uses per-block intermediate losses,
    reference model_pretrainer.py:94-108)."""
    import optax

    def loss_fn(params, batch_stats, batch, dropout_rng):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, return_intermediate=True,
            mutable=["batch_stats"], rngs={"dropout": dropout_rng})
        metrics = pretrain_loss(outs, batch["category_ids"],
                                model.num_classifier_classes)
        return metrics["loss"], (metrics, mutated["batch_stats"])

    def step(state, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   dropout_rng)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats,
                             opt_state=new_opt), metrics

    return step


# -- checkpoint interop (reference DETR_COCO.ipynb cell 32: pre-trainer
#    weights flow into the detection checkpoint via layer sharing) --------


def transfer_to_detr(pretrainer_variables: Dict[str, Any],
                     detr_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Merge the pre-trained shared trunk into a detector's variables.

    The pre-trainer never invokes the detection heads, so its 'detr' subtree
    contains only the trunk (backbone/neck/encoder/decoder) — exactly the
    layers the reference shares (model_pretrainer.py:33-40). Head params stay
    the detector's own.
    """

    def merge(dst: Dict, src: Dict) -> Dict:
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(dst[k], v) if isinstance(v, dict) and isinstance(
                dst.get(k), dict) else v
        return out

    return {
        "params": merge(detr_variables["params"],
                        pretrainer_variables["params"]["detr"]),
        "batch_stats": merge(
            detr_variables.get("batch_stats", {}),
            pretrainer_variables.get("batch_stats", {}).get("detr", {})),
    }


def load_from_detr(pretrainer_variables: Dict[str, Any],
                   detr_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Insert a standalone detector's variables into the pre-trainer tree."""
    out = jax.tree_util.tree_map(lambda x: x, pretrainer_variables)
    out["params"] = dict(out["params"])
    out["batch_stats"] = dict(out.get("batch_stats", {}))
    out["params"]["detr"] = detr_variables["params"]
    out["batch_stats"]["detr"] = detr_variables.get("batch_stats", {})
    return out
