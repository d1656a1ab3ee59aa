"""Infra utils: logging, checkpointing, registry."""

from .logging import get_logger, MetricsLogger
from .checkpoint import CheckpointManager

__all__ = ["get_logger", "MetricsLogger", "CheckpointManager"]
