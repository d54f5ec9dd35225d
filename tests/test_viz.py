"""Headless visualization tests: figures render and save without a display."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hpcs_tpu.decode import linkage
from hpcs_tpu.utils.viz import plot_hyperbolic_eval

KEY = jax.random.PRNGKey(31)


def test_plot_hyperbolic_eval_saves_png(tmp_path):
    N = 48
    pts = np.asarray(jax.random.normal(KEY, (N, 3)))
    y = np.repeat(np.arange(4), N // 4)
    emb = np.asarray(jax.random.normal(jax.random.fold_in(KEY, 1), (N, 8))) * 0.1
    ball = emb[:, :4] * 0.5
    Z = np.asarray(linkage(jnp.asarray(ball)))
    out = tmp_path / "eval.png"
    plot_hyperbolic_eval(x=pts, y=y, y_pred=y[::-1].copy(), emb_hidden=emb,
                         emb_poincare=ball, linkage_matrix=Z, k=4, score=0.5,
                         screenshot=str(out))
    assert out.exists() and out.stat().st_size > 10_000


def test_plot_2d_embeddings(tmp_path):
    # 2-D ball embeddings take the direct (non-PCA) path
    N = 32
    pts = np.random.RandomState(0).randn(N, 3)
    y = np.repeat(np.arange(2), N // 2)
    ball = np.random.RandomState(1).randn(N, 2) * 0.3
    Z = np.asarray(linkage(jnp.asarray(ball)))
    out = tmp_path / "eval2d.png"
    plot_hyperbolic_eval(x=pts, y=y, y_pred=y, emb_hidden=ball, emb_poincare=ball,
                         linkage_matrix=Z, screenshot=str(out))
    assert out.exists()


def test_test_loop_with_plot_dir(tmp_path):
    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.trainer import test as run_test

    cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=2,
                      fixed_points=64, eucl_dim=4, hyp_dim=4, k=8,
                      t_per_anchor=5, num_triplets=512, temperature=0.1)
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=4, npoints=64, num_categories=2,
                              parts_per_object=3)
    loader = DataLoader(ds, 2, drop_last=True)
    state = system.init(KEY, next(iter(loader)))
    out = run_test(system, state, loader, limit_batches=1, plot_dir=str(tmp_path / "p"))
    assert "score" in out
    pngs = os.listdir(tmp_path / "p")
    assert len(pngs) == 2  # one per object in the batch


def test_get_linkage_matches_scipy_cuts():
    """get_linkage on a fitted sklearn model must cut identically to scipy
    linkage on the same data (reference viz.py:526-543 round-trip)."""
    import numpy as np
    from scipy.cluster.hierarchy import fcluster
    from scipy.cluster.hierarchy import linkage as scipy_linkage
    from sklearn.cluster import AgglomerativeClustering
    from sklearn.metrics.cluster import adjusted_rand_score

    from hpcs_tpu.utils.viz import get_linkage

    rng = np.random.RandomState(3)
    x = rng.randn(40, 4)
    model = AgglomerativeClustering(
        linkage="complete", compute_distances=True).fit(x)
    (Z,) = get_linkage(model)
    assert Z.shape == (39, 4)
    Zs = scipy_linkage(x, method="complete", metric="euclidean")
    np.testing.assert_allclose(np.sort(Z[:, 2]), np.sort(Zs[:, 2]), rtol=1e-9)
    np.testing.assert_array_equal(np.sort(Z[:, 3]), np.sort(Zs[:, 3]))
    for k in (2, 3, 6):
        a = fcluster(Z, k, criterion="maxclust")
        b = fcluster(Zs, k, criterion="maxclust")
        assert adjusted_rand_score(a, b) == 1.0


def test_tangent_projection_preserves_radii_order():
    """The hyperbolic-aware disk projection stays in the unit disk and keeps
    the tangent-space PCA plane's radial ORDER for points along one axis."""
    import numpy as np

    from hpcs_tpu.utils.viz import _tangent_project2

    r = np.linspace(0.05, 0.95, 10)
    emb = np.zeros((10, 6))
    emb[:, 0] = r  # increasing depth along one direction
    xy = _tangent_project2(emb)
    rad = np.linalg.norm(xy, axis=1)
    assert np.all(rad < 1.0)
    assert np.all(np.diff(rad) > 0)


def test_eval_figure_tsne_panel(tmp_path):
    """The reference's TSNE euclidean-embedding panel (viz.py:201-214) is
    available via embedding_method='tsne'."""
    import numpy as np

    from hpcs_tpu.utils.viz import plot_hyperbolic_eval

    rng = np.random.RandomState(0)
    N = 48
    fig = plot_hyperbolic_eval(
        x=rng.randn(N, 3), y=rng.randint(0, 3, N), y_pred=rng.randint(0, 3, N),
        emb_hidden=rng.randn(N, 8), emb_poincare=rng.randn(N, 8) * 0.1,
        linkage_matrix=np.column_stack([
            np.arange(N - 1), np.arange(N - 1) + 1,
            np.sort(rng.rand(N - 1)), np.full(N - 1, 2.0)]),
        screenshot=str(tmp_path / "p.png"), embedding_method="tsne")
    assert (tmp_path / "p.png").exists()


def test_plot_confusion_matrix_saves_png(tmp_path):
    """plot_confusion_matrix (reference viz.py:375-441): annotated heatmap,
    raw and row-normalized."""
    import matplotlib.pyplot as plt

    from hpcs_tpu.utils.viz import plot_confusion_matrix

    cm = np.array([[5, 1, 0], [2, 7, 1], [0, 0, 9]])
    out = tmp_path / "cm.png"
    fig = plot_confusion_matrix(cm, classes=["a", "b", "c"], savefig=str(out))
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 5_000
    out2 = tmp_path / "cm_norm.png"
    fig = plot_confusion_matrix(cm, classes=["a", "b", "c"], normalize=True,
                                savefig=str(out2))
    plt.close(fig)
    assert out2.exists()


def test_plot_precision_recall_curve_saves_png(tmp_path):
    import matplotlib.pyplot as plt

    from hpcs_tpu.utils.viz import plot_precision_recall_curve

    rec = np.linspace(1.0, 0.8, 10)
    prec = np.linspace(0.8, 1.0, 10)
    out = tmp_path / "pr.png"
    fig = plot_precision_recall_curve(prec, rec, savefig=str(out))
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 5_000


def test_plot_clustering_and_graph(tmp_path):
    """plot_clustering (ref viz.py:187-199) and plot_graph (ref :250-281)
    render on explicit axes and save headlessly."""
    import matplotlib.pyplot as plt

    from hpcs_tpu.utils.viz import plot_clustering, plot_graph

    rng = np.random.RandomState(0)
    X = rng.randn(40, 2)
    y = np.repeat(np.arange(4), 10)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 5))
    plot_clustering(ax1, X, y, idx=[0, 5, 10])
    e = np.stack([np.arange(39), np.arange(1, 40)])
    plot_graph(ax2, X, e, rng.rand(39))
    out = tmp_path / "cluster_graph.png"
    fig.savefig(out, dpi=80)
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 5_000
