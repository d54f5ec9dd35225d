from .base import HypHCNet, HypHCSystem, TrainState, build_net, decode_vector_for_batch
from .config import ModelConfig


def ShapeNetHypHC(**kwargs) -> HypHCSystem:
    """ShapeNet system (reference hpcs/models/shapenet_hyp_hc.py)."""
    kwargs.setdefault("num_categories", 16)
    return HypHCSystem(ModelConfig(dataset="shapenet", **kwargs))


def PartNetHypHC(**kwargs) -> HypHCSystem:
    """PartNet system (reference hpcs/models/partnet_hyp_hc.py)."""
    kwargs.setdefault("num_categories", 1)
    return HypHCSystem(ModelConfig(dataset="partnet", **kwargs))


__all__ = [
    "HypHCNet",
    "HypHCSystem",
    "TrainState",
    "ModelConfig",
    "ShapeNetHypHC",
    "PartNetHypHC",
    "build_net",
    "decode_vector_for_batch",
]
