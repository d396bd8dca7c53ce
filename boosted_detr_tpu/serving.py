"""Serving export: a standalone StableHLO inference artifact.

The reference's serving story is loadable Keras checkpoints plus code-side
config; here export produces a SELF-CONTAINED directory a serving process
can load WITHOUT the model code:

    model.bin            jax.export-serialized StableHLO with the weights
                         baked in as constants; batch dimension symbolic
                         ("b") so any batch size serves; lowered for both
                         cpu and tpu.
    serving_config.json  vocabulary + image size + model class, so the host
                         text codec can decode predictions to strings.

``export_serving(trainer, path)`` writes it; ``load_serving(path)`` returns
a callable ``images [B,H,W,3] in [0,1] -> (category_strings,
attribute_strings, boxes, extras)`` (or the raw probability dict with
``decode_text=False``) backed only by the artifact. ``extras`` is a dict —
always present, possibly empty — carrying any additional outputs ("masks"
for panoptic exports, "exit_block" for early-exit exports), so the decode
return is fixed-arity regardless of model family.

``export_serving(..., early_exit=True)`` serves the adaptive-depth feature
the reference's README promises but never ships (reference README.md:63-88):
the artifact's graph computes every decoder block's predictions and selects,
per image, the earliest block whose confidence clears a RUNTIME ``threshold``
argument (models/early_exit.py:34 adaptive_select) — the latency knob
travels with the artifact instead of requiring model code.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def export_serving(trainer, path: str,
                   platforms: tuple = ("cpu", "tpu"),
                   early_exit: bool = False,
                   exit_criterion: str = "confidence",
                   use_ema: bool = False) -> str:
    """Serialize ``trainer``'s inference function + current weights.

    ``early_exit=True`` exports the adaptive-select graph instead: the
    artifact takes ``(images, threshold)`` and returns per-image earliest
    exiting block predictions plus ``exit_block`` [B]. ``exit_criterion``
    picks the exit rule baked into the graph: ``"confidence"`` (threshold =
    min confidence) or ``"stability"`` (threshold = max inter-block
    prediction delta; the criterion that actually orders the boosted
    ensemble's cumulative outputs — see models/early_exit.py).

    ``use_ema=True`` bakes the EMA shadow weights (TrainConfig.ema_decay)
    into the artifact instead of the live params — the standard way to
    ship a DETR: train weights stay in the checkpoint, averaged weights go
    to serving.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from boosted_detr_tpu.train import steps as steps_lib

    os.makedirs(path, exist_ok=True)
    model = trainer.model
    state = (steps_lib.with_ema_params(trainer.state) if use_ema
             else trainer.state)
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}

    h, w = trainer.model_cfg.image_size
    b = jexport.symbolic_shape("b")[0]
    image_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)

    if early_exit:
        from boosted_detr_tpu.models import early_exit as early_exit_lib

        if exit_criterion not in ("confidence", "stability"):
            raise ValueError(
                f"unknown exit_criterion: {exit_criterion!r}")
        select = (early_exit_lib.stability_select
                  if exit_criterion == "stability"
                  else early_exit_lib.adaptive_select)

        def infer(image, threshold):
            outs = model.apply(variables, image, train=False,
                               return_intermediate=True)
            preds, exit_block = select(outs, threshold)
            preds["exit_block"] = exit_block
            return preds

        exported = jexport.export(
            jax.jit(infer), platforms=list(platforms))(
                image_spec, jax.ShapeDtypeStruct((), jnp.float32))
    else:
        def infer(image):
            return model.apply(variables, image, train=False)

        exported = jexport.export(
            jax.jit(infer), platforms=list(platforms))(image_spec)
    with open(os.path.join(path, "model.bin"), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "image_size": [h, w],
        "vocab_dict": (trainer.codec.vocab_dict
                       if trainer.codec is not None else None),
        "model_class": type(model).__name__,
        "early_exit": bool(early_exit),
        "exit_criterion": exit_criterion if early_exit else None,
        "ema_weights": bool(use_ema),
        "outputs": "dict(category softmax, attribute sigmoid, boxes COCO"
                   " [x,y,w,h]; masks logits when panoptic; exit_block when"
                   " early_exit)",
    }
    with open(os.path.join(path, "serving_config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


class ServingModel:
    """Inference callable restored from an exported artifact (no model
    code / config / checkpoint needed)."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, "model.bin"), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(os.path.join(path, "serving_config.json")) as f:
            self.meta = json.load(f)
        self.codec = None
        if self.meta.get("vocab_dict"):
            from boosted_detr_tpu.data.codec import TextCodec

            self.codec = TextCodec(self.meta["vocab_dict"])

    def __call__(self, images: np.ndarray, decode_text: bool = True,
                 threshold: Optional[float] = None):
        """Serve a batch. Decode path returns the FIXED-arity 4-tuple
        ``(category_strings, attribute_strings, boxes, extras)``; ``extras``
        is a (possibly empty) dict with "masks" / "exit_block" when the
        artifact produces them. ``threshold`` sets the early-exit knob for
        early-exit artifacts; its meaning follows the exported
        ``exit_criterion`` (confidence floor, or stability delta ceiling).
        The default is the full-depth degenerate value for either criterion
        (confidence 1.0 / stability 0.0)."""
        images = np.asarray(images, np.float32)
        if self.meta.get("early_exit"):
            if threshold is None:
                threshold = (0.0 if self.meta.get("exit_criterion")
                             == "stability" else 1.0)
            thr = np.float32(threshold)
            preds = self._exported.call(images, thr)
        else:
            if threshold is not None:
                raise ValueError(
                    "this artifact was exported without early_exit=True; "
                    "re-export with export_serving(..., early_exit=True) to "
                    "serve a runtime threshold")
            preds = self._exported.call(images)
        preds = {k: np.asarray(v) for k, v in preds.items()}
        if decode_text and self.codec is not None:
            decode_in = {k: v for k, v in preds.items()
                         if k in ("category", "attribute", "boxes")}
            cats, atts, boxes = self.codec.decode_predictions(decode_in)
            extras = {k: v for k, v in preds.items()
                      if k not in ("category", "attribute", "boxes")}
            return cats, atts, boxes, extras
        return preds


def load_serving(path: str) -> ServingModel:
    return ServingModel(path)
