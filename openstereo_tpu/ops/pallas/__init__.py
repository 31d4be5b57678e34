from .corr_volume import correlation_volume_pallas, build_gwc_volume_pallas  # noqa: F401
