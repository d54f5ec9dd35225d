"""PML loss_and_miner_utils (1.6.3 semantics, only what the reference uses)."""
import torch

from . import common_functions as c_f


def convert_to_weights(indices_tuple, labels, dtype):
    """Weight per batch element by how often it appears in indices_tuple,
    normalized so the most frequent element has weight 1 (PML 1.6.3)."""
    weights = torch.zeros(labels.shape[0], device=labels.device).type(dtype)
    if indices_tuple is None:
        return weights + 1
    if all(len(x) <= 1 for x in indices_tuple):
        return weights + 1
    indices, counts = torch.unique(torch.cat(indices_tuple, dim=0), return_counts=True)
    counts = c_f.to_dtype(counts, dtype=dtype) / torch.sum(counts)
    weights[indices] = counts / torch.max(counts)
    return weights


def get_all_triplets_indices(labels, ref_labels=None):
    if ref_labels is None:
        ref_labels = labels
    labels1 = labels.unsqueeze(1)
    labels2 = ref_labels.unsqueeze(0)
    matches = (labels1 == labels2).byte()
    diffs = matches ^ 1
    if ref_labels is labels:
        matches.fill_diagonal_(0)
    triplets = matches.unsqueeze(2) * diffs.unsqueeze(1)
    return torch.where(triplets)


def convert_to_triplets(indices_tuple, labels, ref_labels=None, t_per_anchor=100):
    if indices_tuple is None:
        return get_all_triplets_indices(labels, ref_labels)
    if len(indices_tuple) == 3:
        return indices_tuple
    # (a1, p, a2, n) pair form -> triplets where a1 == a2
    a1, p, a2, n = indices_tuple
    p_idx, n_idx = torch.where(a1.unsqueeze(1) == a2.unsqueeze(0))
    return a1[p_idx], p[p_idx], n[n_idx]


def meshgrid_from_sizes(x, y, dim=0):
    a = torch.arange(x.size(dim), device=x.device)
    b = torch.arange(y.size(dim), device=y.device)
    return torch.meshgrid(a, b, indexing="ij")
