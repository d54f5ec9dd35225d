"""Minimal faithful shim of pytorch_metric_learning 1.6.3 (see README.md)."""
from . import distances, losses, miners, reducers, utils  # noqa: F401
