"""PML reducers (1.6.3 semantics): loss_dict -> scalar."""
import torch


class BaseReducer(torch.nn.Module):
    def forward(self, loss_dict, embeddings, labels):
        assert len(loss_dict) == 1 or "loss" in loss_dict
        total = 0
        for info in loss_dict.values():
            losses = info["losses"]
            reduction_type = info["reduction_type"]
            if reduction_type == "already_reduced":
                total = total + losses
                continue
            if not torch.is_tensor(losses):
                losses = torch.as_tensor(losses, dtype=embeddings.dtype,
                                         device=embeddings.device)
            if losses.numel() == 0:
                total = total + torch.sum(embeddings * 0)
                continue
            total = total + self.reduce(losses)
        return total

    def reduce(self, losses):
        raise NotImplementedError


class MeanReducer(BaseReducer):
    def reduce(self, losses):
        return torch.mean(losses)


class AvgNonZeroReducer(BaseReducer):
    """ThresholdReducer(low=0): average over strictly-positive elements;
    zero (with graph) if none are positive."""

    def reduce(self, losses):
        mask = losses > 0
        if torch.any(mask):
            return torch.mean(losses[mask])
        return torch.sum(losses) * 0
