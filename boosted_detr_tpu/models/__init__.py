from boosted_detr_tpu.models import backbone, detr, heads, layers  # noqa: F401
