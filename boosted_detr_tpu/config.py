"""Configuration dataclasses.

Parameter names mirror the reference's public config surface
(reference: ModelComponents/parameters.py:160-178 and README.md:146-158) so a
user of the reference finds the same knobs: ``num_object_preds``,
``image_size``, ``num_encoder_blocks``, ``num_encoder_heads``, ``encoder_dim``,
``num_decoder_blocks``, ``num_decoder_heads``, ``decoder_dim``,
``num_panoptic_heads``, ``panoptic_dim``, ``vocab_dict``.

TPU-native additions: dtype policy, matcher selection, mesh/sharding knobs,
and compatibility flags for reference quirks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

PAD_TOKEN = "<PAD>"
OOV_TOKEN = "<OOV>"

# Default loss weights (reference: losses_and_metrics.py:8-11).
DEFAULT_CATEGORY_WEIGHT = 1000.0
DEFAULT_BOX_WEIGHT = 1.0
DEFAULT_ATTRIBUTE_WEIGHT = 100.0
DEFAULT_EXIST_WEIGHT = 100.0


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Matching-loss term weights (reference: losses_and_metrics.py:8-11).

    Kept outside checkpointed model config, mirroring the reference's decision
    to exclude loss weights from ``get_config`` so checkpoints stay loadable
    when weights change (reference: model.py:37-42).
    """

    category: float = DEFAULT_CATEGORY_WEIGHT
    box: float = DEFAULT_BOX_WEIGHT
    attribute: float = DEFAULT_ATTRIBUTE_WEIGHT
    exist: float = DEFAULT_EXIST_WEIGHT
    # Box-loss internal weights (reference: losses_and_metrics.py:68).
    giou: float = 2.0
    l2: float = 5.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # --- reference-parity surface (parameters.py:160-178) ---
    num_object_preds: int = 96
    image_size: Tuple[int, int] = (560, 560)
    num_encoder_blocks: int = 4
    num_encoder_heads: int = 8
    encoder_dim: int = 256
    num_decoder_blocks: int = 4
    num_decoder_heads: int = 8
    decoder_dim: int = 256
    num_panoptic_heads: int = 1
    panoptic_dim: int = 32
    num_categories: int = 82  # vocab size incl. <PAD> and <OOV>
    num_attributes: int = 296  # vocab size incl. <PAD> and <OOV>
    classification_only: bool = False

    # --- architecture ---
    # efficientnet_lite | efficientnet_b4 (faithful: SE + swish + B4
    # compound scaling, param-pinned vs keras) | resnet | tiny |
    # vit[_pP][_dD][_wW][_hH]
    # ("vit" = pre-LN ViT-Small-ish, dim 384 / 8 blocks / 6 heads / patch 16
    # — a TPU-first extension with no BatchNorm at any resolution; see
    # models/backbone.py ViTBackbone and benchmarks/RESULTS.md)
    backbone: str = "efficientnet_lite"
    backbone_width: float = 1.0
    # ResNet stem: "conv7" = classic 7x7/s2 + 3x3 maxpool; "patchify" =
    # TPU-first 4x4/s4 conv (same stride-4 / 64-ch contract, no maxpool —
    # profiling shows the classic stem cluster costs ~6 ms of a 32 ms
    # 640px train step on v5e; see benchmarks/RESULTS.md)
    # "patchify8" = 8x8/s8 conv, skipping the stride-4 stage entirely (the
    # HBM-roofline-bound one); same stride-32 output contract.
    stem: str = "conv7"  # conv7 | patchify | patchify8
    # Input preprocessing parity (images arrive in [0,1]): "scale" = [-1,1]
    # (from-scratch default); "imagenet" = torch RGB mean/std; "caffe" =
    # Keras resnet.preprocess_input parity (RGB->BGR, channel means;
    # reference backbone.py:37-39). Match this to imported pretrained
    # weights (models/pretrained.py).
    preprocessing: str = "scale"
    # Hidden dim of classification heads; the reference uses 4*decoder_dim for
    # standard DETR (model.py:101-108) and decoder_dim for boosted
    # (boosted_model.py:118-137). None = 4*decoder_dim.
    head_hidden_dim: Optional[int] = None
    dropout_rate: float = 0.1  # transformers.py:135, :179
    layernorm_epsilon: float = 1e-3  # transformers.py:137 (keras default 1e-3)

    # --- data contract ---
    max_objects: int = 32  # static padded object count per image

    # --- TPU-native knobs ---
    compute_dtype: str = "bfloat16"  # model compute; loss/matching stay f32
    # hungarian (exact, XLA, default) | pallas (exact, kernel) |
    # auction / greedy (approximate) | hungarian_host (scipy; CPU only)
    matcher: str = "hungarian"
    use_pallas_attention: bool = False
    # fused Pallas patchify-stem kernel (ResNet patchify/patchify8 stems +
    # ViT patch embed): clip + preprocessing + space-to-depth + matmul in
    # ONE HBM pass — replaces the convert/relayout/3-channel-conv cluster
    # (isolated stem fwd+dW 2.93x XLA; quality-neutral at protocol scale
    # and parity-gated on-chip, benchmarks/RESULTS.md round 4). ON in the
    # TPU bench flagship; the global default stays False because off-TPU
    # the kernel runs in the (slow) Pallas interpreter.
    use_pallas_stem: bool = False
    # batchnorm | groupnorm (parity flag, SURVEY §7) | skipinit (norm-free:
    # weight-standardized convs + zero-init residual gains — no activation
    # stats passes, designed for the 80px BatchNorm HBM roofline)
    norm: str = "batchnorm"

    # --- boosted-architecture ablations (the namesake question) ---
    # Object-query handling across weak-learner blocks:
    #   "fresh"      = reference behavior: zero-init object queries re-tiled
    #                  per block (reference boosted_model.py:210-211);
    #   "carry"      = block i>0's decoder queries are block i-1's decoder
    #                  OUTPUT features (plain-DETR-style sequential query
    #                  refinement; cumulative prediction sums unchanged);
    #   "confidence" = the reference README's dark "Option 2"
    #                  (reference README.md:83-88): decoder features carry
    #                  forward AND slots whose max class probability clears
    #                  ``boosted_carry_threshold`` FREEZE — their features
    #                  and outputs stop updating in later blocks; per-slot
    #                  per-block head outputs replace cumulative sums.
    boosted_queries: str = "fresh"  # fresh | carry | confidence
    boosted_carry_threshold: float = 0.9
    # One shared ``num_encoder_blocks``-deep encoder run ONCE (plain-DETR
    # style) feeding every weak-learner decoder block, instead of the
    # reference's 1-block encoder per weak learner (boosted_model.py:85-92).
    # Staged freezing (TrainConfig.train_block) does not freeze the shared
    # encoder; intended for joint training ablations.
    boosted_shared_encoder: bool = False

    # --- reference-quirk compatibility flags (SURVEY §7 "quirk management") ---
    # Post-softmax multiplicative attention masking without renorm
    # (transformers.py:89-94). Only observable when a mask is passed.
    post_softmax_mask: bool = True
    # Boosted model counts block 0's predictions twice
    # (boosted_model.py:222-229). Default False = fixed; True = bit-parity.
    block0_double_count: bool = False

    # --- early-exit inference (reference README.md:63-88, unimplemented) ---
    early_exit_threshold: Optional[float] = None
    # "confidence" (reference sketch: min confidence floor) or "stability"
    # (PABEE-style inter-block delta ceiling). RECOMMENDED: stability with
    # tau=1.5 on converged boosted checkpoints — measured val mAP50 0.603 /
    # mAP 0.261 vs 0.511/0.218 full depth at HALF the decoder compute, with
    # a 3x-wide tau plateau (1.0-3.0); tau <= 0.3 degenerates to full depth
    # (the right answer for under-trained checkpoints). The confidence
    # criterion is dominated by stability at every measured setting
    # (benchmarks/RESULTS.md round-5 early-exit tables).
    early_exit_criterion: str = "confidence"

    @property
    def resolved_head_hidden_dim(self) -> int:
        return self.head_hidden_dim or 4 * self.decoder_dim

    @property
    def grid_size(self) -> Tuple[int, int]:
        """Backbone output grid (stride-32), e.g. 560x560 -> 18x18 (ceil)."""
        return (-(-self.image_size[0] // 32), -(-self.image_size[1] // 32))

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8  # reference DETR_COCO.ipynb cell 35
    learning_rate: float = 1e-3
    lr_schedule: str = "cosine_restarts"  # cosine_restarts | aiayn | constant
    warmup_steps: int = 4000
    momentum: float = 0.9
    nesterov: bool = True
    clipnorm: float = 0.1  # reference DETR_COCO.ipynb cell 26
    # Adaptive gradient clipping lambda (0 = off): clip each unit's gradient
    # to agc_clip * its parameter norm (Brock et al., NFNets) — the
    # published stabilizer for norm-free ResNets (norm='skipinit'), whose
    # residual branches otherwise spike under plain clipping or none.
    agc_clip: float = 0.0
    # Exponential moving average of the params (0 = off): the shadow copy
    # updates on-device inside the train step (ema = d*ema + (1-d)*p) and
    # evaluate/predict can read it with use_ema=True — the standard DETR
    # eval-quality lever the reference's Keras loop has no hook for.
    ema_decay: float = 0.0
    optimizer: str = "sgd"  # sgd | adamw
    weight_decay: float = 0.0
    loss_weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    # Staged boosted training: index of the single trainable weak-learner
    # block (backbone + other blocks frozen), or None = train everything
    # (reference Boosted_DETR_COCO.ipynb cell 30).
    train_block: Optional[int] = None
    # Freeze BatchNorm statistics: the train step runs normalization with
    # the RUNNING averages (no batch-stat reduction passes — the 80px
    # activation traffic the roofline identifies, benchmarks/RESULTS.md)
    # and batch_stats stay untouched, while params keep training. Intended
    # as a post-warmup phase in the dropout-0 protocol (train=False forward:
    # dropout is disabled too); see train_val_suite.py 'flagship_fbn'.
    freeze_bn_stats: bool = False
    # Loss on intermediate decoder blocks (reference model.py:179 hard-codes
    # False for standard DETR; boosted always uses per-block losses).
    use_intermediate_losses: bool = False
    # Average (rather than sum) the per-block intermediate losses: keeps the
    # gradient scale of a single-block run, so aux supervision composes with
    # a learning rate tuned WITHOUT it (summing L blocks multiplies the
    # effective lr by ~L — measured to push lr 1e-4 past the divergence
    # point on the val-suite protocol, benchmarks/RESULTS.md).
    intermediate_loss_avg: bool = False
    seed: int = 0
    # mesh
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 8}
    # checkpointing
    checkpoint_dir: Optional[str] = None
    keep_checkpoints: int = 3

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class Filepaths:
    """Path conventions (reference parameters.py:12-56 encodes Colab/Drive
    paths with interactive input() fallbacks; here plain fields with the
    same default_params() accessor)."""

    model_name: str = "custom_DETR"
    dataset_name: str = "COCO"
    archive_base_dir: str = "/tmp/datasets/archive"
    local_base_dir: str = "/tmp/datasets/local"
    checkpoint_load_dir: str = "/tmp/checkpoints"
    checkpoint_save_dir: str = "/tmp/checkpoints"
    model_files_dir: str = ""
    tfrec_files_dir: str = "/tmp/tfrecords"

    def default_params(self, value: Optional[str] = None):
        params = dataclasses.asdict(self)
        return params[value] if value is not None else params


def from_yaml(path: str, **cli_overrides: Any) -> Tuple[ModelConfig,
                                                        TrainConfig]:
    """YAML + CLI config overlay (SURVEY §5.6): a file with optional 'model'
    and 'train' sections; ``cli_overrides`` use dotted keys like
    ``model.encoder_dim=512`` or ``train.batch_size=16``."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    model_kw = dict(raw.get("model", {}))
    train_kw = dict(raw.get("train", {}))
    for key, val in cli_overrides.items():
        section, _, name = key.partition(".")
        if section == "model":
            model_kw[name] = val
        elif section == "train":
            train_kw[name] = val
        else:
            raise KeyError(f"override '{key}' must start with model./train.")
    if "image_size" in model_kw:
        model_kw["image_size"] = tuple(model_kw["image_size"])
    if "loss_weights" in train_kw:
        train_kw["loss_weights"] = LossWeights(**train_kw["loss_weights"])
    return ModelConfig(**model_kw), TrainConfig(**train_kw)


# ---------------------------------------------------------------------------
# Built-in vocabularies (reference: parameters.py:117-153 hard-codes COCO and
# Fashionpedia vocab dicts; we expose the same `vocab_dict(name)` surface but
# load the word lists from the dataset loaders in boosted_detr_tpu.data).
# ---------------------------------------------------------------------------

def default_params(dataset_name: str = "COCO", **overrides: Any) -> ModelConfig:
    """Equivalent of ``ModelParameters.default_params()``
    (reference: parameters.py:160-178)."""
    from boosted_detr_tpu.data import vocabularies

    vocab = vocabularies.vocab_dict(dataset_name)
    cfg = ModelConfig(
        num_categories=len(vocab["category"]) + 2,  # + PAD + OOV
        num_attributes=len(vocab["attribute"]) + 2,
    )
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
