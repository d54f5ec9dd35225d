"""EdgeConv graph-feature construction for DGCNN-style backbones.

Behavioral reference: /root/reference/hpcs/nn/dgcnn/utils/vn_dgcnn_util.py:13-68.
Feature layout here is [B, N, C, 3] (vector-neuron channels) or [B, N, C]
(scalar channels); edge features get a neighbor axis: [B, N, K, ., .].

The reference flattens vector channels to C*3 scalars for the kNN metric —
we do the same, so graph topology matches exactly.
"""
import jax.numpy as jnp

from .knn import gather_neighbors, knn_auto as knn


def graph_feature_vn(x, k, idx=None, coords=None, layout="cv"):
    """Vector-neuron edge features.

    "cv": x [B, N, C, 3] -> [B, N, K, 2C, 3]; "vc": x [B, N, 3, C] ->
    [B, N, K, 3, 2C] = concat(neighbor - center, center) over the channel
    axis (reference get_graph_feature :13-41).
    If `coords` [B, N, D] is given, the kNN graph is built on those
    coordinates instead of the (flattened) features.
    """
    B, N = x.shape[:2]
    C3 = x.shape[-2] * x.shape[-1]
    caxis = -2 if layout == "cv" else -1
    if idx is None:
        metric = coords if coords is not None else x.reshape(B, N, C3)
        idx = knn(metric, k)
    neighbors = gather_neighbors(x, idx)  # [B, N, K, ., .]
    center = jnp.broadcast_to(x[:, :, None], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=caxis), idx


def graph_feature_cross_vn(x, k, idx=None):
    """Edge features with cross products: [B, N, C, 3] -> [B, N, K, 3C, 3] =
    concat(neighbor - center, center, neighbor x center)
    (reference get_graph_feature_cross :44-68; its hard-coded CUDA device is a
    reference bug we do not reproduce)."""
    B, N, C, _ = x.shape
    if idx is None:
        idx = knn(x.reshape(B, N, C * 3), k)
    neighbors = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[:, :, None], neighbors.shape)
    cross = jnp.cross(neighbors, center)
    return jnp.concatenate([neighbors - center, center, cross], axis=-2), idx


def graph_feature_scalar(x, k, idx=None, coords=None):
    """Scalar-channel edge features for plain DGCNN.

    x: [B, N, C] -> [B, N, K, 2C] = concat(neighbor - center, center)
    (reference dgcnn_util.get_graph_feature)."""
    if idx is None:
        metric = coords if coords is not None else x
        idx = knn(metric, k)
    neighbors = gather_neighbors(x, idx)  # [B, N, K, C]
    center = jnp.broadcast_to(x[:, :, None], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=-1), idx
