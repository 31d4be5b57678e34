from .metrics import epe_metric, d1_metric, threshold_metric, compute_metrics, METRIC_FNS  # noqa: F401
