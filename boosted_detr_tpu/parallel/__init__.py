from boosted_detr_tpu.parallel import mesh, sharding  # noqa: F401
