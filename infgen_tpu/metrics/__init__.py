from infgen_tpu.metrics.features import MetricFeatures, compute_metric_features  # noqa: F401
from infgen_tpu.metrics.wosac import WosacConfig, compute_scenario_metrics, make_log_distributions  # noqa: F401
