from .linkage import (
    cosine_distance_matrix,
    cut_maxclust,
    cut_maxclust_fcluster,
    euclidean_distance_matrix,
    linkage,
    linkage_from_distances,
    linkage_from_distances_mnn,
)
from .scores import (
    adjusted_rand_index,
    contingency,
    eval_clustering,
    get_optimal_k,
    purity,
    remap_consecutive,
)

__all__ = [
    "cosine_distance_matrix",
    "cut_maxclust",
    "cut_maxclust_fcluster",
    "euclidean_distance_matrix",
    "linkage",
    "linkage_from_distances",
    "linkage_from_distances_mnn",
    "adjusted_rand_index",
    "contingency",
    "eval_clustering",
    "get_optimal_k",
    "purity",
    "remap_consecutive",
]
