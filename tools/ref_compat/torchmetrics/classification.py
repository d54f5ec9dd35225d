import torch


class MulticlassJaccardIndex(torch.nn.Module):
    """Macro-averaged IoU over classes present in prediction or target."""

    def __init__(self, num_classes, **kwargs):
        super().__init__()
        self.num_classes = num_classes

    def forward(self, preds, target):
        if preds.dim() == target.dim() + 1:
            preds = preds.argmax(dim=-1)
        inter = torch.zeros(self.num_classes, dtype=torch.float32)
        count_t = torch.zeros(self.num_classes, dtype=torch.float32)
        count_p = torch.zeros(self.num_classes, dtype=torch.float32)
        eq = (preds == target).float()
        inter.index_add_(0, target, eq)
        count_t.index_add_(0, target, torch.ones_like(eq))
        count_p.index_add_(0, preds, torch.ones_like(eq))
        union = count_t + count_p - inter
        present = union > 0
        iou = torch.where(present, inter / union.clamp(min=1e-12),
                          torch.zeros_like(union))
        return iou.sum() / present.sum().clamp(min=1)
