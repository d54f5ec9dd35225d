"""torchmetrics shim: functional Accuracy / MulticlassJaccardIndex.

Semantics match hpcs_tpu.utils.metrics (top-1 accuracy; macro IoU over
classes present in prediction or target) so the two pipelines report
comparable numbers.
"""
import torch

from . import classification  # noqa: F401
from .classification import MulticlassJaccardIndex  # noqa: F401


class Accuracy(torch.nn.Module):
    def __init__(self, task="multiclass", num_classes=None, top_k=1, **kwargs):
        super().__init__()
        self.num_classes = num_classes
        self.top_k = top_k

    def forward(self, preds, target):
        if preds.dim() == target.dim() + 1:
            preds = preds.argmax(dim=-1)
        return (preds == target).float().mean()
