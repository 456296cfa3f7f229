from infgen_tpu.ops.neighbors import topk_neighbors  # noqa: F401
from infgen_tpu.ops.sampling import sample_from_topk  # noqa: F401
