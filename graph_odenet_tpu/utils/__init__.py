"""Utilities: metrics, structured logging, checkpointing, profiling
(SURVEY.md §5 — the aux subsystems the reference lacks or improvises)."""

from graph_odenet_tpu.utils.metrics import accuracy, masked_accuracy, masked_nll  # noqa: F401
from graph_odenet_tpu.utils.logging import MetricsLogger  # noqa: F401
