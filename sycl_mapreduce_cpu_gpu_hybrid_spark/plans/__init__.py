from .metrics import MetricsRecorder, timed  # noqa: F401
