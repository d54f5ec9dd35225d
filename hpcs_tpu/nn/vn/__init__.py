from .layers import (
    EPS,
    VNBatchNorm,
    VNLeakyReLU,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
    invariant_project,
    mean_pool,
)

__all__ = [
    "EPS",
    "VNBatchNorm",
    "VNLeakyReLU",
    "VNLinear",
    "VNLinearLeakyReLU",
    "VNMaxPool",
    "VNStdFeature",
    "invariant_project",
    "mean_pool",
]
