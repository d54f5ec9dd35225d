"""PML losses (1.6.3 semantics for the paths the reference exercises).

CosFaceLoss math (the reference's default metric loss, ultrametric_loss.py:37):
cosine logits against L2-normalized class weights W, margin subtracted from
the target-class cosine, scaled, per-element cross-entropy weighted by miner
counts, mean-reduced.
"""
import torch
from torch.nn import functional as F

from ..distances import CosineSimilarity, LpDistance
from ..reducers import AvgNonZeroReducer, MeanReducer
from ..utils import common_functions as c_f
from ..utils import loss_and_miner_utils as lmu


class BaseMetricLossFunction(torch.nn.Module):
    def __init__(self, collect_stats=False, reducer=None, distance=None, **kwargs):
        super().__init__()
        self.collect_stats = collect_stats
        self.distance = distance if distance is not None else self.get_default_distance()
        self.reducer = reducer if reducer is not None else self.get_default_reducer()

    def forward(self, embeddings, labels=None, indices_tuple=None,
                ref_emb=None, ref_labels=None):
        self.reset_stats()
        if labels is not None:
            labels = c_f.to_device(labels, embeddings)
        loss_dict = self.compute_loss(embeddings, labels, indices_tuple,
                                      ref_emb, ref_labels)
        return self.reducer(loss_dict, embeddings, labels)

    def compute_loss(self, embeddings, labels, indices_tuple, ref_emb, ref_labels):
        raise NotImplementedError

    def get_default_reducer(self):
        return MeanReducer()

    def get_default_distance(self):
        return LpDistance(p=2)

    def zero_losses(self):
        return {"loss": {"losses": 0, "indices": None,
                         "reduction_type": "already_reduced"}}

    def reset_stats(self):
        pass

    def add_to_recordable_attributes(self, *args, **kwargs):
        pass

    def add_weight_regularization_to_loss_dict(self, loss_dict, weights):
        # no weight regularizer configured anywhere in the reference
        return loss_dict


class LargeMarginSoftmaxLoss(BaseMetricLossFunction):
    def __init__(self, num_classes, embedding_size, margin=28.6, scale=64, **kwargs):
        super().__init__(**kwargs)
        self.num_classes = num_classes
        self.embedding_size = embedding_size
        self.margin = margin
        self.scale = scale
        self.init_margin()
        self.W = torch.nn.Parameter(torch.Tensor(embedding_size, num_classes))
        torch.nn.init.normal_(self.W)
        self.cross_entropy = torch.nn.CrossEntropyLoss(reduction="none")

    def get_default_distance(self):
        return CosineSimilarity()

    def init_margin(self):
        self.margin = torch.tensor(self.margin)

    def cast_types(self, dtype, device):
        self.W.data = c_f.to_device(self.W.data, device=device, dtype=dtype)

    def get_target_mask(self, embeddings, labels):
        mask = torch.zeros(embeddings.size(0), self.num_classes,
                           dtype=embeddings.dtype, device=embeddings.device)
        mask[torch.arange(labels.size(0)), labels] = 1
        return mask

    def get_cosine(self, embeddings):
        return self.distance(embeddings, self.W.t())

    def get_angles(self, cosine_of_target_classes):
        return torch.acos(torch.clamp(cosine_of_target_classes, -1 + 1e-7, 1 - 1e-7))

    def modify_cosine_of_target_classes(self, cosine_of_target_classes):
        angles = self.get_angles(cosine_of_target_classes)
        return torch.cos(angles + self.margin)

    def scale_logits(self, logits, embeddings):
        return logits * self.scale

    def compute_loss(self, embeddings, labels, indices_tuple, ref_emb=None,
                     ref_labels=None):
        c_f.labels_required(labels)
        c_f.ref_not_supported(embeddings, labels, ref_emb, ref_labels)
        dtype, device = embeddings.dtype, embeddings.device
        self.cast_types(dtype, device)
        miner_weights = lmu.convert_to_weights(indices_tuple, labels, dtype=dtype)
        mask = self.get_target_mask(embeddings, labels)
        cosine = self.get_cosine(embeddings)
        cosine_of_target_classes = cosine[mask == 1]
        modified_cosine_of_target_classes = self.modify_cosine_of_target_classes(
            cosine_of_target_classes
        )
        diff = (modified_cosine_of_target_classes - cosine_of_target_classes).unsqueeze(1)
        logits = cosine + (mask * diff)
        logits = self.scale_logits(logits, embeddings)
        unweighted_loss = self.cross_entropy(logits, labels)
        miner_weighted_loss = unweighted_loss * miner_weights
        loss_dict = {
            "loss": {
                "losses": miner_weighted_loss,
                "indices": c_f.torch_arange_from_size(embeddings),
                "reduction_type": "element",
            }
        }
        self.add_weight_regularization_to_loss_dict(loss_dict, self.W.t())
        return loss_dict


class CosFaceLoss(LargeMarginSoftmaxLoss):
    """logits = scale * (cos(theta) - margin * onehot(target))"""

    def init_margin(self):
        pass

    def modify_cosine_of_target_classes(self, cosine_of_target_classes):
        if self.collect_stats:
            with torch.no_grad():
                self.get_angles(cosine_of_target_classes)
        return cosine_of_target_classes - self.margin

    def scale_logits(self, logits, *_):
        return logits * self.scale


class TripletMarginLoss(BaseMetricLossFunction):
    def __init__(self, margin=0.05, swap=False, smooth_loss=False,
                 triplets_per_anchor="all", **kwargs):
        super().__init__(**kwargs)
        self.margin = margin
        self.swap = swap
        self.smooth_loss = smooth_loss
        self.triplets_per_anchor = triplets_per_anchor

    def compute_loss(self, embeddings, labels, indices_tuple, ref_emb=None,
                     ref_labels=None):
        c_f.labels_or_indices_tuple_required(labels, indices_tuple)
        indices_tuple = lmu.convert_to_triplets(
            indices_tuple, labels, ref_labels, t_per_anchor=self.triplets_per_anchor
        )
        anchor_idx, positive_idx, negative_idx = indices_tuple
        if len(anchor_idx) == 0:
            return self.zero_losses()
        mat = self.distance(embeddings, ref_emb)
        ap_dists = mat[anchor_idx, positive_idx]
        an_dists = mat[anchor_idx, negative_idx]
        if self.swap:
            pn_dists = mat[positive_idx, negative_idx]
            an_dists = self.distance.smallest_dist(an_dists, pn_dists)
        current_margins = self.distance.margin(ap_dists, an_dists)
        violation = current_margins + self.margin
        if self.smooth_loss:
            loss = F.softplus(violation)
        else:
            loss = F.relu(violation)
        return {"loss": {"losses": loss, "indices": indices_tuple,
                         "reduction_type": "triplet"}}

    def get_default_reducer(self):
        return AvgNonZeroReducer()
