from boosted_detr_tpu.data import codec, vocabularies  # noqa: F401
