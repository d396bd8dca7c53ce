"""Boosted DETR: paired encoder/decoder weak learners with summed predictions.

Reference: ModelComponents/boosted_model.py. Architecture (reference
boosted_model.py:199-230):

- ONE backbone + neck;
- per weak-learner block i: a 1-block image encoder with its OWN learned
  positional encoding, a SHARED DecoderPrep (so object queries are re-tiled
  fresh each block from the same zero-init variable,
  boosted_model.py:210-211), decoder block i (block 0 without
  self-attention), and per-block prediction heads with hidden_dim =
  decoder_dim (boosted_model.py:118-137, narrower than standard DETR's 4x);
- predictions are summed cumulatively across blocks; the matched loss is
  computed on the CUMULATIVE sums at every block (boosted_model.py:232-243).

Reference quirk: block 0's predictions are counted twice (initialized at
boosted_model.py:222-225 then += again at :227-229). ``config.
block0_double_count=True`` reproduces that bit-exactly; the default (False)
fixes it (SURVEY §7 quirk management).

``focused_training_layer`` trains one weak learner: the forward stops at that
block and only its cumulative loss is returned (boosted_model.py:171, :245),
combined with optimizer-mask freezing (see train.steps.make_optimizer).

Architecture ablations (config flags, measured in benchmarks/RESULTS.md):

- ``boosted_queries="carry"``: block i>0's decoder queries are block i-1's
  decoder OUTPUT (instead of re-tiled zero-init queries) — isolates the
  reference's fresh-queries-per-block choice (boosted_model.py:210-211).
- ``boosted_queries="confidence"``: the reference README's unimplemented
  "Option 2" (reference README.md:83-88): decoder features carry forward
  and slots whose max class probability clears
  ``boosted_carry_threshold`` freeze — later blocks neither update their
  features nor overwrite their predictions; per-block head outputs replace
  the cumulative sums (each block's output stays a calibrated
  distribution).
- ``boosted_shared_encoder=True``: one ``num_encoder_blocks``-deep encoder
  run once (plain-DETR style) feeds every decoder block — isolates the
  per-block 1-block encoders.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from boosted_detr_tpu.config import ModelConfig
from boosted_detr_tpu.models import layers
from boosted_detr_tpu.models.backbone import BackboneNeck, EncoderBackbone
from boosted_detr_tpu.models.heads import (BoxPredictionHead,
                                           MultiClassPredictionHead,
                                           SingleClassPredictionHead)


class BoostedDETR(nn.Module):
    config: ModelConfig
    focused_training_layer: Optional[int] = None

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        n = cfg.num_decoder_blocks
        self.backbone = EncoderBackbone(cfg.backbone, cfg.backbone_width,
                                        cfg.norm, dtype, cfg.stem,
                                        cfg.preprocessing,
                                        cfg.use_pallas_attention,
                                        cfg.use_pallas_stem,
                                        name="backbone")
        self.neck = BackboneNeck(cfg.encoder_dim, cfg.norm, dtype,
                                 name="neck")
        if cfg.boosted_shared_encoder:
            # ablation: ONE deep encoder run once (plain-DETR style)
            self.encoders = [
                layers.ImageEncoder(cfg.num_encoder_blocks,
                                    cfg.num_encoder_heads, cfg.dropout_rate,
                                    cfg.layernorm_epsilon, dtype,
                                    cfg.post_softmax_mask,
                                    cfg.use_pallas_attention,
                                    name="encoder_shared")
            ]
        else:
            # one single-block encoder per weak learner (each with its own
            # positional-encoding variable, reference boosted_model.py:85-92)
            self.encoders = [
                layers.ImageEncoder(1, cfg.num_encoder_heads,
                                    cfg.dropout_rate,
                                    cfg.layernorm_epsilon, dtype,
                                    cfg.post_softmax_mask,
                                    cfg.use_pallas_attention,
                                    name=f"encoder_{i}")
                for i in range(n)
            ]
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
            for i in range(n)
        ]
        self.category_heads = [
            SingleClassPredictionHead(
                cfg.num_categories, cfg.decoder_dim, cfg.num_object_preds,
                cfg.norm, dtype, name=f"category_head_{i}")
            for i in range(n)
        ]
        self.attribute_heads = [
            MultiClassPredictionHead(
                cfg.num_attributes, cfg.decoder_dim, cfg.num_object_preds,
                cfg.norm, dtype, name=f"attribute_head_{i}")
            for i in range(n)
        ]
        self.box_heads = [
            BoxPredictionHead(cfg.decoder_dim, cfg.num_object_preds,
                              cfg.norm, dtype, name=f"box_head_{i}")
            for i in range(n)
        ]

    def __call__(self, image, *, train: bool = False,
                 return_intermediate: bool = False):
        cfg = self.config
        feats = self.backbone(image, train=train)
        feats = self.neck(feats, train=train)
        b, r, c, d = feats.shape

        focused = self.focused_training_layer
        mode = cfg.boosted_queries
        shared = cfg.boosted_shared_encoder
        cat_sum = att_sum = box_sum = None
        out_cat = out_att = out_box = None  # "confidence" mode accumulators
        frozen = None                       # [B, P] sticky freeze mask
        dec_prev = None
        outputs: List[Dict[str, jnp.ndarray]] = []
        tokens = pos = None
        if shared:
            tokens, pos = self.encoders[0](feats, deterministic=not train)
        for i in range(cfg.num_decoder_blocks):
            if not shared:
                grid = feats if i == 0 else tokens.reshape(b, r, c, d)
                tokens, pos = self.encoders[i](grid, deterministic=not train)
            enc_value, dec, enc_key, _ = self.decoder_prep(tokens, pos)
            if mode != "fresh" and i > 0:
                # carry block i-1's decoder output as block i's queries
                dec = dec_prev
            dec = self.decoder_blocks[i](enc_value, dec, enc_key,
                                         deterministic=not train)
            if mode == "confidence" and i > 0:
                # Option 2: frozen slots keep their carried features
                dec = jnp.where(frozen[:, :, None], dec_prev, dec)
            dec_prev = dec
            cat_i = self.category_heads[i](dec, train=train)
            att_i = self.attribute_heads[i](dec, train=train)
            box_i = self.box_heads[i](dec, train=train)

            if mode == "confidence":
                # retain high-confidence predictions from the block where
                # the slot froze; unfrozen slots track the latest block
                if out_cat is None:
                    out_cat, out_att, out_box = cat_i, att_i, box_i
                else:
                    m = frozen[:, :, None]
                    out_cat = jnp.where(m, out_cat, cat_i)
                    out_att = jnp.where(m, out_att, att_i)
                    out_box = jnp.where(m, out_box, box_i)
                conf = jnp.max(out_cat.astype(jnp.float32), axis=-1)
                newly = conf >= cfg.boosted_carry_threshold
                frozen = newly if frozen is None else (frozen | newly)
                block_out = {"category": out_cat, "attribute": out_att,
                             "boxes": out_box}
            else:
                if cat_sum is None:
                    if cfg.block0_double_count:
                        # bit-parity with reference boosted_model.py:222-229
                        cat_sum, att_sum, box_sum = (2 * cat_i, 2 * att_i,
                                                     2 * box_i)
                    else:
                        cat_sum, att_sum, box_sum = cat_i, att_i, box_i
                else:
                    cat_sum = cat_sum + cat_i
                    att_sum = att_sum + att_i
                    box_sum = box_sum + box_i
                block_out = {"category": cat_sum, "attribute": att_sum,
                             "boxes": box_sum}

            if focused is None or i == focused:
                outputs.append(block_out)
            if focused is not None and i == focused:
                break

        return outputs if return_intermediate else outputs[-1]
