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
