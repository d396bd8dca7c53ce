"""The standard DETR model (Flax), reference: ModelComponents/model.py.

Pure-functional design: the module maps images to prediction probabilities
(category softmax / attribute sigmoids / COCO boxes); losses live OUTSIDE the
module in ``ops.matching.matching_loss`` and are wired in by the trainer's
jitted train step (unlike the reference, which buries the loss inside
``call()`` via Keras ``add_loss``, model.py:208 — same math, but here the
whole step including the matcher compiles as one XLA program).

Text tokenization also lives outside (host-side codec in
``data/codec.py``), so the device graph is int/float-only — this is the
host/device split that removes the reference's TPU-incompatible string ops
(reference README.md:53).
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp

from boosted_detr_tpu.config import ModelConfig
from boosted_detr_tpu.models import layers
from boosted_detr_tpu.models.backbone import BackboneNeck, EncoderBackbone
from boosted_detr_tpu.models.heads import (BoxPredictionHead,
                                           MultiClassPredictionHead,
                                           SingleClassPredictionHead)


class DETR(nn.Module):
    """Backbone -> neck -> N encoder blocks -> M decoder blocks -> 3 heads
    (reference model.py:145-233). Returns a list of per-decoder-block
    prediction dicts when ``return_intermediate`` (used by intermediate
    losses, reference model.py:179-204), else just the final block's.
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        self.backbone = EncoderBackbone(cfg.backbone, cfg.backbone_width,
                                        cfg.norm, dtype, cfg.stem,
                                        cfg.preprocessing,
                                        cfg.use_pallas_attention,
                                        cfg.use_pallas_stem,
                                        name="backbone")
        self.neck = BackboneNeck(cfg.encoder_dim, cfg.norm, dtype,
                                 name="neck")
        self.encoder = layers.ImageEncoder(
            cfg.num_encoder_blocks, cfg.num_encoder_heads, cfg.dropout_rate,
            cfg.layernorm_epsilon, dtype, cfg.post_softmax_mask,
            cfg.use_pallas_attention, name="encoder")
        self.decoder_prep = layers.DecoderPrep(
            cfg.num_object_preds, cfg.decoder_dim, dtype, name="decoder_prep")
        self.decoder_blocks = [
            layers.DecoderBlock(
                cfg.num_decoder_heads, self_attention=(i > 0),
                dropout_rate=cfg.dropout_rate,
                layernorm_epsilon=cfg.layernorm_epsilon, dtype=dtype,
                post_softmax_mask=cfg.post_softmax_mask,
                use_pallas=cfg.use_pallas_attention,
                name=f"decoder_block_{i}")
            for i in range(cfg.num_decoder_blocks)
        ]
        # head hidden dims: 4*decoder_dim for classification heads,
        # decoder_dim for the box head (reference model.py:99-114)
        self.category_head = SingleClassPredictionHead(
            cfg.num_categories, cfg.resolved_head_hidden_dim,
            cfg.num_object_preds, cfg.norm, dtype, name="category_head")
        self.attribute_head = MultiClassPredictionHead(
            cfg.num_attributes, cfg.resolved_head_hidden_dim,
            cfg.num_object_preds, cfg.norm, dtype, name="attribute_head")
        self.box_head = BoxPredictionHead(
            cfg.decoder_dim, cfg.num_object_preds, cfg.norm, dtype,
            name="box_head")

    def encode(self, image, *, train: bool = False):
        """Backbone + neck + transformer encoder -> (tokens, positional)."""
        feats = self.backbone(image, train=train)
        feats = self.neck(feats, train=train)
        return self.encoder(feats, deterministic=not train)

    def apply_heads(self, decoder_features, *, train: bool = False
                    ) -> Dict[str, jnp.ndarray]:
        return {
            "category": self.category_head(decoder_features, train=train),
            "attribute": self.attribute_head(decoder_features, train=train),
            "boxes": self.box_head(decoder_features, train=train),
        }

    def __call__(self, image, *, train: bool = False,
                 return_intermediate: bool = False):
        tokens, pos = self.encode(image, train=train)
        enc_value, dec, enc_key, _ = self.decoder_prep(tokens, pos)

        outputs: List[Dict[str, jnp.ndarray]] = []
        n = len(self.decoder_blocks)
        for i, block in enumerate(self.decoder_blocks):
            dec = block(enc_value, dec, enc_key, deterministic=not train)
            if return_intermediate or i == n - 1:
                outputs.append(self.apply_heads(dec, train=train))
        return outputs if return_intermediate else outputs[-1]
