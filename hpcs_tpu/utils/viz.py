"""Headless visualization of hierarchical segmentations.

Behavioral reference: /root/reference/hpcs/utils/viz.py — plot_cloud :27-121
and the 5-panel plot_hyperbolic_eval :284-372 (GT cloud, predicted cloud,
embedding scatter, Poincare-disk projection, dendrogram).  The reference
renders through pyvista/UMAP in an interactive window (not headless-safe and
pyvista/umap are heavyweight GUI deps); here everything is matplotlib Agg,
saving straight to PNG, with a PCA projection replacing UMAP/TSNE panels.
"""
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _colors(labels):
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    cmap = plt.get_cmap("tab20")
    lut = {l: cmap(i % 20) for i, l in enumerate(uniq)}
    return [lut[l] for l in labels]


def plot_cloud(ax, points, labels=None, title=""):
    """3-D scatter of one cloud colored by labels."""
    points = np.asarray(points)
    c = _colors(labels) if labels is not None else "steelblue"
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=c, s=3)
    ax.set_title(title)
    ax.set_axis_off()


def _pca2(x):
    x = np.asarray(x, np.float64)
    x = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def plot_poincare_disk(ax, emb, labels, title="Poincare disk"):
    """2-D (PCA if dim > 2) projection of ball embeddings inside the unit disk."""
    emb = np.asarray(emb)
    xy = emb[:, :2] if emb.shape[1] == 2 else _pca2(emb)
    n = np.linalg.norm(xy, axis=1, keepdims=True)
    r = np.linalg.norm(np.asarray(emb), axis=1, keepdims=True)
    xy = np.where(n > 0, xy / n * r, xy)  # keep true radii
    circle = plt.Circle((0, 0), 1.0, fill=False, color="gray", lw=0.8)
    ax.add_patch(circle)
    ax.scatter(xy[:, 0], xy[:, 1], c=_colors(labels), s=4)
    ax.set_xlim(-1.05, 1.05)
    ax.set_ylim(-1.05, 1.05)
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.set_axis_off()


def plot_dendrogram(ax, Z, max_leaves=64, title="dendrogram"):
    """Merge-height profile of the linkage matrix (full dendrogram layout via
    scipy when available, height curve otherwise)."""
    Z = np.asarray(Z, np.float64)
    try:
        from scipy.cluster.hierarchy import dendrogram

        dendrogram(Z, ax=ax, no_labels=True, truncate_mode="lastp",
                   p=min(max_leaves, Z.shape[0] + 1), color_threshold=None)
    except Exception:
        ax.plot(np.sort(Z[:, 2]))
        ax.set_xlabel("merge")
        ax.set_ylabel("distance")
    ax.set_title(title)


def plot_hyperbolic_eval(x, y, y_pred, emb_hidden, emb_poincare, linkage_matrix,
                         k=None, score=None, screenshot=None, show=False):
    """5-panel evaluation figure; returns the figure (saved when `screenshot`).

    x: [N, 3] points; y/y_pred: [N] labels; emb_hidden: [N, De];
    emb_poincare: [N, Dh]; linkage_matrix: [N-1, 4].
    """
    fig = plt.figure(figsize=(18, 4))
    ax1 = fig.add_subplot(1, 5, 1, projection="3d")
    plot_cloud(ax1, x, y, title="ground truth")
    ax2 = fig.add_subplot(1, 5, 2, projection="3d")
    sub = f" (k={int(k)}, iou={float(score):.3f})" if k is not None else ""
    plot_cloud(ax2, x, y_pred, title="prediction" + sub)
    ax3 = fig.add_subplot(1, 5, 3)
    h2 = _pca2(emb_hidden) if np.asarray(emb_hidden).shape[1] != 2 else np.asarray(emb_hidden)
    ax3.scatter(h2[:, 0], h2[:, 1], c=_colors(y), s=4)
    ax3.set_title("euclidean embedding (PCA)")
    ax4 = fig.add_subplot(1, 5, 4)
    plot_poincare_disk(ax4, emb_poincare, y)
    ax5 = fig.add_subplot(1, 5, 5)
    plot_dendrogram(ax5, linkage_matrix)
    fig.tight_layout()
    if screenshot:
        fig.savefig(screenshot, dpi=110)
    if not show:
        plt.close(fig)
    return fig
