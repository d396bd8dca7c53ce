from boosted_detr_tpu.native import lap_binding  # noqa: F401
