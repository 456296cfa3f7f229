from infgen_tpu.model.infgen import InfGenModel  # noqa: F401
