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
attribute_strings, boxes)`` (or the raw probability dict with
``decode_text=False``) backed only by the artifact.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def export_serving(trainer, path: str,
                   platforms: tuple = ("cpu", "tpu")) -> str:
    """Serialize ``trainer``'s inference function + current weights."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    model = trainer.model
    params = jax.device_get(trainer.state.params)
    batch_stats = jax.device_get(trainer.state.batch_stats)

    def infer(image):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           image, train=False)

    h, w = trainer.model_cfg.image_size
    b = jexport.symbolic_shape("b")[0]
    exported = jexport.export(
        jax.jit(infer), platforms=list(platforms))(
            jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32))
    with open(os.path.join(path, "model.bin"), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "image_size": [h, w],
        "vocab_dict": (trainer.codec.vocab_dict
                       if trainer.codec is not None else None),
        "model_class": type(model).__name__,
        "outputs": "dict(category softmax, attribute sigmoid, boxes COCO"
                   " [x,y,w,h]; masks logits when panoptic)",
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

    def __call__(self, images: np.ndarray, decode_text: bool = True):
        preds = self._exported.call(np.asarray(images, np.float32))
        preds = {k: np.asarray(v) for k, v in preds.items()}
        if decode_text and self.codec is not None:
            decoded = self.codec.decode_predictions(preds)
            if "masks" in preds:  # panoptic export: keep the mask logits
                return (*decoded, preds["masks"])
            return decoded
        return preds


def load_serving(path: str) -> ServingModel:
    return ServingModel(path)
