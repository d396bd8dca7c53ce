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
losses_and_metrics.py:249) — is replaced by a batched auction LAP solver that
runs on-device, so the full train step compiles as one XLA program.
"""

__version__ = "0.1.0"

from boosted_detr_tpu.config import ModelConfig, TrainConfig, default_params  # noqa: F401
