import torch

from . import stereographic  # noqa: F401


class PoincareBall(torch.nn.Module):
    def __init__(self, c=1.0):
        super().__init__()
        self.register_buffer("c", torch.as_tensor(c, dtype=torch.float32))

    def _not_available(self, *args, **kwargs):
        raise RuntimeError("geoopt shim: manifold math not available")

    # class-level attributes referenced by the reference's dead subclasses
    # (poincareball.py:68-83 aliases these at class-definition time)
    expmap_transp = _not_available
    transp_follow_expmap = _not_available
    expmap = _not_available
    retr = _not_available
    retr_transp = _not_available
    transp_follow_retr = _not_available
    proju = _not_available
    projx = _not_available
    dist = _not_available
    norm = _not_available
    logmap = _not_available
