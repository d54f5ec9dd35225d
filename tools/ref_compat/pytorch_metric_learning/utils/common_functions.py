"""PML common_functions (1.6.3 semantics, only what the reference uses)."""
import torch


def to_device(x, tensor=None, device=None, dtype=None):
    dv = device if device is not None else (tensor.device if tensor is not None else None)
    if dv is not None:
        x = x.to(dv)
    if dtype is not None:
        x = x.to(dtype)
    return x


def to_dtype(x, tensor=None, dtype=None):
    dt = dtype if dtype is not None else (tensor.dtype if tensor is not None else None)
    return x.to(dt) if dt is not None else x


def torch_arange_from_size(input, size_dim=0):
    return torch.arange(input.size(size_dim), device=input.device)


def labels_required(labels):
    if labels is None:
        raise ValueError("labels cannot be None for this loss function")


def labels_or_indices_tuple_required(labels, indices_tuple):
    if labels is None and indices_tuple is None:
        raise ValueError("labels and indices_tuple cannot both be None")


def ref_not_supported(embeddings, labels, ref_emb, ref_labels):
    if ref_emb is not embeddings and ref_emb is not None:
        raise ValueError("ref_emb is not supported for this loss function")


class TorchInitWrapper:
    def __init__(self, init_func, **kwargs):
        self.init_func = init_func
        self.kwargs = kwargs

    def __call__(self, tensor):
        self.init_func(tensor, **self.kwargs)
