"""Host-side (scipy/sklearn) decode fallbacks, used for verification.

These mirror the reference's CPU decode exactly
(/root/reference/hpcs/models/base_hyp_hc.py:81-86 and
/root/reference/hpcs/utils/scores.py:141-199) and serve as the golden oracle
for the on-device implementations in linkage.py / scores.py.
"""
import itertools

import numpy as np

try:
    from scipy.cluster.hierarchy import fcluster as _fcluster
    from scipy.cluster.hierarchy import linkage as _linkage

    HAVE_SCIPY = True
except Exception:  # pragma: no cover
    HAVE_SCIPY = False


def linkage_host(x, method="complete", metric="cosine"):
    return _linkage(np.asarray(x, np.float64), method=method, metric=metric)


def cut_maxclust_host(Z, k):
    return _fcluster(Z, k, criterion="maxclust") - 1


def remap_labels_host(y):
    _, y_remap = np.unique(y, return_inverse=True)
    return y_remap


def binary_iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union > 0 else 0.0


def get_optimal_k_host(y, Z, index="iou"):
    """Direct numpy mirror of the reference get_optimal_k (scores.py:141-177)."""
    from sklearn.metrics.cluster import adjusted_rand_score

    y = np.asarray(y)
    best_score, best_k, best_pred = 0.0, 0, None
    y_true = remap_labels_host(y)
    c = len(np.unique(y_true))
    for k in range(1, c + 5):
        y_pred = cut_maxclust_host(Z, k)
        if index == "ri":
            k_score = adjusted_rand_score(y, y_pred)
        elif index == "iou":
            kp = len(np.unique(y_pred))
            matrix = np.zeros((c, kp))
            for i in range(c):
                for j in range(kp):
                    matrix[i, j] = binary_iou(y_true == i, y_pred == j)
            ind = matrix.argmax(axis=1)
            y_remap = np.zeros_like(y_pred)
            for i in range(c):
                y_remap[y_pred == int(ind[i])] = i + 1
            y_true_cat = np.eye(c + 1)[y_true + 1]
            y_pred_cat = np.eye(c + 1)[y_remap]
            k_score = np.logical_and(y_true_cat, y_pred_cat).sum() / np.logical_or(
                y_true_cat, y_pred_cat
            ).sum()
        else:
            raise ValueError(index)
        if k_score > best_score:
            best_score, best_k, best_pred = k_score, k, y_pred
    return best_pred, best_k, best_score


def accuracy_clustering_host(y_true, y_pred):
    """Best-permutation clustering accuracy (reference scores.py:180-199);
    exponential in the number of clusters — host/small-C only."""
    from sklearn.metrics import accuracy_score

    y_true = remap_labels_host(np.asarray(y_true))
    labels = np.unique(y_true)
    scores = []
    for perm in itertools.permutations(labels):
        y_permuted = np.zeros_like(y_true)
        for i, k in enumerate(perm):
            y_permuted[y_pred == k] = labels[i]
        scores.append(accuracy_score(y_true, y_permuted))
    return max(scores)


def purity_host(y_true, y_pred):
    y_true = remap_labels_host(np.asarray(y_true))
    correct = 0
    for cluster in np.unique(y_pred):
        members = y_true[y_pred == cluster]
        if len(members):
            correct += np.bincount(members).max()
    return correct / len(y_true)


def compute_scores(y_true, y_pred, threshold=0.0, print_info=False, sample_name=None):
    """Binary prediction scores (reference scores.py:14-57)."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        jaccard_score,
        precision_score,
        recall_score,
    )

    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if threshold > 0.0:
        y_pred = (y_pred > threshold).flatten()
    scores = {
        "f1": f1_score(y_true, y_pred),
        "recall": recall_score(y_true, y_pred),
        "precision": precision_score(y_true, y_pred),
        "acc": accuracy_score(y_true, y_pred),
        "jaccard": jaccard_score(y_true, y_pred),
    }
    if print_info:
        print(f"Scores {sample_name}: {scores}")
    return scores
