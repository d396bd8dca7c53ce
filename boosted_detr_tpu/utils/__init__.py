from boosted_detr_tpu.utils import visualize  # noqa: F401
