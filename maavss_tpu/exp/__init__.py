from maavss_tpu.exp.metrics import MetricsLogger, Meter  # noqa: F401
