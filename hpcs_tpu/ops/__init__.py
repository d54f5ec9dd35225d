from .edgeconv import graph_feature_cross_vn, graph_feature_scalar, graph_feature_vn
from .knn import gather_neighbors, knn, knn_auto, pairwise_neg_sqdist

__all__ = [
    "graph_feature_cross_vn",
    "graph_feature_scalar",
    "graph_feature_vn",
    "gather_neighbors",
    "knn",
    "knn_auto",
    "pairwise_neg_sqdist",
]
