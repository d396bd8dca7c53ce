from boosted_detr_tpu.train import schedules, steps  # noqa: F401
