from . import BaseMetricLossFunction  # noqa: F401
