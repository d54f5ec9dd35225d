"""geoopt shim — import-level only (reference usage is dead code:
vn_dgcnn_expo/poincareball/manifold_layers, pulled in by hpcs.nn.dgcnn's
__init__ but never executed)."""
import torch

from . import manifolds  # noqa: F401


class ManifoldParameter(torch.nn.Parameter):
    def __new__(cls, data=None, requires_grad=True, manifold=None, **kwargs):
        obj = super().__new__(cls, data, requires_grad)
        obj.manifold = manifold
        return obj
