"""boosted_detr_tpu — a TPU-native JAX framework for DETR / Boosted-DETR.

A from-scratch re-design of the capabilities of mvenouziou/Boosted_DETR
(TensorFlow/Keras) as an idiomatic JAX / XLA / Pallas / pjit framework:

- `ops`      — pure-math building blocks: box geometry, loss primitives, the
               batched on-device bipartite matcher (XLA and Pallas forms).
- `models`   — Flax modules: CNN backbones, DETR transformer encoder/decoder,
               prediction heads, the boosted weak-learner variant, the
               classifier pre-trainer, and the panoptic neck.
- `data`     — host-side COCO/Fashionpedia ETL, text<->id codec, padded-batch
               feeding, plus an on-device (jit-compiled) augmentation stage.
- `parallel` — mesh construction and sharding rules (pjit/GSPMD).
- `train`    — Keras-like compile()/fit() trainer, LR schedules, checkpointing
               (orbax), metrics and a COCO-protocol mAP evaluator.

The reference's acknowledged TPU blocker — a host-side scipy Hungarian matcher
invoked through `tf.numpy_function` (reference: ModelComponents/
losses_and_metrics.py:249) — is replaced by an exact batched Hungarian solver
that runs on-device (XLA and Pallas forms, plus approximate auction/greedy
backends), so the full train step compiles as one XLA program.
"""

__version__ = "0.1.0"

from boosted_detr_tpu.config import (LossWeights, ModelConfig,  # noqa: F401
                                     TrainConfig, default_params)


def __getattr__(name):
    # lazy top-level access to the user-facing API classes:
    # boosted_detr_tpu.DETR / BoostedDETR / DETR_MultiClassifier
    if name in ("DETR", "BoostedDETR", "DETR_MultiClassifier"):
        from boosted_detr_tpu import api

        return getattr(api, name)
    raise AttributeError(name)
