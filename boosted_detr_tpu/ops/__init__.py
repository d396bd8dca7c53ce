from boosted_detr_tpu.ops import boxes, losses, matching  # noqa: F401
