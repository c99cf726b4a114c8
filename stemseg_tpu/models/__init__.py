from stemseg_tpu.models.builder import STEmSegModel, build_model  # noqa: F401
