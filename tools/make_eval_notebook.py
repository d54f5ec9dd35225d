#!/usr/bin/env python
"""Generate + execute examples/shapenet_eval.ipynb — the per-category
evaluation notebook (the reference's notebooks/ShapeNet.ipynb deliverable:
restore a checkpoint, render per-category predictions; reference cells call
visualization(category, ...) per category).

Ours restores the converged mini-ShapeNet checkpoint trained by
tools/parity_real_format.py, and per category shows: the 5-panel
hyperbolic eval figure per object, a part-label confusion matrix
(CosFace-logit predictions), the cluster-vs-part contingency at the best
cut, and a summary score table.

Usage: python tools/make_eval_notebook.py [--ckpt DIR] [--execute]
"""
import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CKPT = os.path.join("..", "benchmarks", "_parity_logs",
                            "parity_rf_jax_s0", "checkpoints", "final")


def code(src):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": src}


def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src}


CELL_SETUP = '''\
%matplotlib inline
# Per-category evaluation on mini-ShapeNet (real txt format).
# Mirrors the reference's notebooks/ShapeNet.ipynb: restore a trained
# checkpoint, evaluate + render predictions per category.
import os, sys
sys.path.insert(0, os.path.abspath('..'))  # executes from examples/
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

from hpcs_tpu.data import DataLoader, ShapeNetDataset
from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.utils.checkpoint import load_config, restore_checkpoint

CKPT = os.path.abspath('%CKPT%')
RAW = os.path.abspath(os.path.join('..', 'data', 'ShapeNet', 'raw'))
NPOINTS, BATCH = 256, 2

cfg_dict = load_config(CKPT)
cfg_dict['hierarchy_list'] = ()
cfg = ModelConfig(**cfg_dict)
system = HypHCSystem(cfg)
print('restored config:', {k: cfg_dict[k] for k in
      ('model_name', 'eucl_dim', 'hyp_dim', 'num_class', 'k')})
'''

CELL_HELPERS = '''\
from hpcs_tpu.loss import get_logits
from hpcs_tpu.utils.viz import (plot_confusion_matrix, plot_hyperbolic_eval,
                                plot_precision_recall_curve)

_state = {}

def _restored_state(sample):
    if 'state' not in _state:
        st = system.init(jax.random.PRNGKey(0), sample)
        st, _, _ = restore_checkpoint(CKPT, st)
        _state['state'] = st
    return _state['state']

def evaluate_category(category, max_objects=4, plot=True):
    """Run the full decode test path on one category's test split; returns
    per-object rows and renders the reference's per-object panels."""
    ds = ShapeNetDataset(RAW, npoints=NPOINTS, split='test',
                         class_choice=category)
    loader = DataLoader(ds, BATCH)
    rows, n_shown = [], 0
    y_all, yhat_all, cont_true, cont_cluster = [], [], [], []
    key = jax.random.PRNGKey(7)
    for bi, batch in enumerate(loader):
        state = _restored_state(batch)
        logs, extras = system.test_step(state, batch,
                                        jax.random.fold_in(key, bi),
                                        jnp.float32(system.temperature))
        # CosFace class predictions for the part-label confusion matrix
        flat = extras['x_poincare'].reshape(-1, extras['x_poincare'].shape[-1])
        logits = get_logits(system.loss_cfg, state.params['cosface_W'], flat,
                            jnp.asarray(batch['labels']).reshape(-1))
        yhat = np.asarray(jnp.argmax(logits, -1)).reshape(batch['labels'].shape)
        for oi in range(batch['points'].shape[0]):
            if len(rows) >= max_objects:
                break
            y = batch['labels'][oi]
            rows.append(dict(category=category,
                             best_k=int(extras['best_k'][oi]),
                             true_parts=len(np.unique(y)),
                             score=float(extras['best_score'][oi])))
            y_all.append(y); yhat_all.append(yhat[oi])
            cont_true.append(y); cont_cluster.append(np.asarray(extras['pred'][oi]))
            if plot and n_shown < 2:
                fig = plot_hyperbolic_eval(
                    x=np.asarray(batch['points'][oi]), y=np.asarray(y),
                    y_pred=np.asarray(extras['pred'][oi]),
                    emb_hidden=np.asarray(extras['x_euclidean'][oi]),
                    emb_poincare=np.asarray(extras['x_poincare'][oi]),
                    linkage_matrix=np.asarray(extras['linkage'][oi]),
                    k=int(extras['best_k'][oi]),
                    score=float(extras['best_score'][oi]), show=True)
                plt.show()
                n_shown += 1
    y_cat = np.concatenate(y_all); yhat_cat = np.concatenate(yhat_all)
    parts = np.unique(np.concatenate([y_cat, yhat_cat]))
    lut = {p: i for i, p in enumerate(parts)}
    cm = np.zeros((len(parts), len(parts)), int)
    for t, p in zip(y_cat, yhat_cat):
        cm[lut[t], lut[p]] += 1
    if plot:
        fig = plot_confusion_matrix(cm, classes=[f'part {p}' for p in parts],
                                    normalize=True, figsize=(5, 5),
                                    title=f'{category}: part label confusion '
                                          '(CosFace preds)')
        plt.show()
    return rows
'''

CELL_SUMMARY = '''\
import pandas as pd
df = pd.DataFrame(all_rows)
per_cat = df.groupby('category').agg(
    objects=('score', 'size'), mean_best_k=('best_k', 'mean'),
    mean_true_parts=('true_parts', 'mean'), mean_score=('score', 'mean'))
print(per_cat.to_string())
print(f"\\noverall decode score (mean best-k IoU): {df['score'].mean():.4f}")
'''

CELL_PR = '''\
# Precision-recall of the most frequent part class from the CosFace logits
# (exercises plot_precision_recall_curve, reference viz.py:444-468)
from sklearn.metrics import precision_recall_curve
ds = ShapeNetDataset(RAW, npoints=NPOINTS, split='test')
batch = next(iter(DataLoader(ds, 4)))
state = _restored_state(batch)
xp = system.net.apply({'params': state.params,
                       'batch_stats': state.batch_stats},
                      jnp.asarray(batch['points']),
                      jax.nn.one_hot(batch['category'], cfg.num_categories),
                      train=False)[1]
flat = xp.reshape(-1, xp.shape[-1])
labels = jnp.asarray(batch['labels']).reshape(-1)
logits = np.asarray(get_logits(system.loss_cfg, state.params['cosface_W'],
                               flat, labels))
probs = np.exp(logits - logits.max(-1, keepdims=True))
probs /= probs.sum(-1, keepdims=True)
top = int(np.bincount(np.asarray(labels)).argmax())
prec, rec, _ = precision_recall_curve((np.asarray(labels) == top).astype(int),
                                      probs[:, top])
fig = plot_precision_recall_curve(prec, rec, figsize=(5, 5),
                                  xlim=[0, 1], ylim=[0, 1],
                                  title=f'part {top} PR')
plt.show()
'''


CELL_SETUP_PARTNET = '''\
%matplotlib inline
# Per-category evaluation on mini-PartNet (real h5 format) — the
# reference's notebooks/PartNet.ipynb deliverable on the TPU-native stack.
import os, sys
sys.path.insert(0, os.path.abspath('..'))  # executes from examples/
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

from hpcs_tpu.data import DataLoader, PartNetDataset
from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.utils.checkpoint import load_config, restore_checkpoint

CKPT = os.path.abspath('%CKPT%')
H5 = os.path.abspath(os.path.join('..', 'data', 'PartNet', 'sem_seg_h5',
                                  'Bottle-3'))
NPOINTS, BATCH = 256, 2

# Bootstrap from a clean clone (no binary blobs in git — VERDICT r4 #8):
# generate the format-exact mini dataset if absent, then train the
# checkpoint with the recipe that produced the round-4 evaluation
# (train.py --dataset partnet --category Bottle --level 3, deterministic
# seed; a few minutes on CPU).
import shutil, subprocess
_ROOT = os.path.abspath('..')
if not os.path.exists(H5):
    subprocess.run([sys.executable, 'tools/make_mini_datasets.py'],
                   cwd=_ROOT, check=True)
if not os.path.exists(os.path.join(CKPT, 'model.ckpt')):
    print('checkpoint missing - training it now (~3 min on CPU)...')
    _log = os.path.join(_ROOT, 'benchmarks', '_partnet_bottle_logs')
    subprocess.run([sys.executable, 'train.py', '--dataset', 'partnet',
                    '--category', 'Bottle', '--level', '3',
                    '--fixed_points', str(NPOINTS),
                    '--eucl_embedding', '4', '--hyp_embedding', '4',
                    '--k', '10', '--t_per_anchor', '8',
                    '--temperature', '0.1', '--lr', '0.05',
                    '--margin', '0.35', '--trade_off', '0.1',
                    '--epochs', '60', '--batch', '2', '--seed', '0',
                    '--accelerator', 'cpu', '--log', _log],
                   cwd=_ROOT, check=True)
    _final = os.path.join(_log, 'partnet_vn_dgcnn_partseg',
                          'checkpoints', 'final')
    os.makedirs(CKPT, exist_ok=True)
    for _f in os.listdir(_final):
        shutil.copy(os.path.join(_final, _f), CKPT)

cfg_dict = load_config(CKPT)
def _freeze(h):
    return tuple(tuple(tuple(ch) for ch in lvl) for lvl in h)
cfg_dict['hierarchy_list'] = _freeze(cfg_dict.get('hierarchy_list', ()))
cfg = ModelConfig(**cfg_dict)
system = HypHCSystem(cfg)
print('restored config:', {k: cfg_dict[k] for k in
      ('model_name', 'dataset', 'eucl_dim', 'hyp_dim', 'num_class', 'k',
       'hierarchical')})
'''

CELL_HELPERS_PARTNET = '''\
from hpcs_tpu.loss import get_logits
from hpcs_tpu.utils.viz import plot_confusion_matrix, plot_hyperbolic_eval

_state = {}

def _restored_state(sample):
    if 'state' not in _state:
        st = system.init(jax.random.PRNGKey(0), sample)
        st, _, _ = restore_checkpoint(CKPT, st)
        _state['state'] = st
    return _state['state']

def evaluate_split(split='test', max_objects=4, plot=True):
    ds = PartNetDataset(os.path.join(H5, f'{split}_files.txt'), NPOINTS)
    loader = DataLoader(ds, BATCH)
    rows, n_shown = [], 0
    y_all, yhat_all = [], []
    key = jax.random.PRNGKey(7)
    for bi, batch in enumerate(loader):
        state = _restored_state(batch)
        logs, extras = system.test_step(state, batch,
                                        jax.random.fold_in(key, bi),
                                        jnp.float32(system.temperature))
        flat = extras['x_poincare'].reshape(-1, extras['x_poincare'].shape[-1])
        logits = get_logits(system.loss_cfg, state.params['cosface_W'], flat,
                            jnp.asarray(batch['labels']).reshape(-1))
        yhat = np.asarray(jnp.argmax(logits, -1)).reshape(batch['labels'].shape)
        for oi in range(batch['points'].shape[0]):
            if len(rows) >= max_objects:
                break
            y = batch['labels'][oi]
            rows.append(dict(split=split, best_k=int(extras['best_k'][oi]),
                             true_parts=len(np.unique(y)),
                             score=float(extras['best_score'][oi])))
            y_all.append(y); yhat_all.append(yhat[oi])
            if plot and n_shown < 2:
                fig = plot_hyperbolic_eval(
                    x=np.asarray(batch['points'][oi]), y=np.asarray(y),
                    y_pred=np.asarray(extras['pred'][oi]),
                    emb_hidden=np.asarray(extras['x_euclidean'][oi]),
                    emb_poincare=np.asarray(extras['x_poincare'][oi]),
                    linkage_matrix=np.asarray(extras['linkage'][oi]),
                    k=int(extras['best_k'][oi]),
                    score=float(extras['best_score'][oi]), show=True)
                plt.show()
                n_shown += 1
    y_cat = np.concatenate(y_all); yhat_cat = np.concatenate(yhat_all)
    parts = np.unique(np.concatenate([y_cat, yhat_cat]))
    lut = {p: i for i, p in enumerate(parts)}
    cm = np.zeros((len(parts), len(parts)), int)
    for t, p in zip(y_cat, yhat_cat):
        cm[lut[t], lut[p]] += 1
    if plot:
        fig = plot_confusion_matrix(cm, classes=[f'part {p}' for p in parts],
                                    normalize=True, figsize=(5, 5),
                                    title='Bottle level-3: part confusion '
                                          '(CosFace preds)')
        plt.show()
    return rows
'''

CELL_SUMMARY_PARTNET = '''\
import pandas as pd
df = pd.DataFrame(all_rows)
print(df.to_string(index=False))
print(f"\\nmean decode score (best-k IoU): {df['score'].mean():.4f}")
'''


def build_partnet(ckpt):
    return {"cells": [
        md("# Per-category evaluation — mini-PartNet (Bottle, level 3)\n\n"
           "The reference's `notebooks/PartNet.ipynb` deliverable: restore a "
           "converged checkpoint (hierarchical CosFace + HypHC loss, "
           "trained by `train.py --dataset partnet --category Bottle`), "
           "render per-object hyperbolic eval panels, part confusion, "
           "score table."),
        code(CELL_SETUP_PARTNET.replace("%CKPT%", ckpt)),
        code(CELL_HELPERS_PARTNET),
        md("## Bottle — test split"),
        code("all_rows = []\nall_rows += evaluate_split('test')"),
        md("## Summary"),
        code(CELL_SUMMARY_PARTNET),
    ], "metadata": {"kernelspec": {"display_name": "Python 3",
                                   "language": "python",
                                   "name": "python3"},
                    "language_info": {"name": "python"}},
        "nbformat": 4, "nbformat_minor": 5}


def build(ckpt):
    cells = [
        md("# Per-category evaluation — mini-ShapeNet\n\n"
           "The reference's `notebooks/ShapeNet.ipynb` deliverable "
           "(restore checkpoint → per-category predictions), on the "
           "TPU-native stack: checkpoint trained to convergence by "
           "`tools/parity_real_format.py` on the real-format mini-ShapeNet "
           "under `data/ShapeNet/raw`.  Per category: 5-panel hyperbolic "
           "eval per object, part-label confusion matrix, score table."),
        code(CELL_SETUP.replace("%CKPT%", ckpt)),
        code(CELL_HELPERS),
        md("## Airplane"),
        code("all_rows = []\nall_rows += evaluate_category('Airplane')"),
        md("## Cap"),
        code("all_rows += evaluate_category('Cap')"),
        md("## Summary"),
        code(CELL_SUMMARY),
        md("## Precision-recall helper"),
        code(CELL_PR),
    ]
    return {"cells": cells,
            "metadata": {"kernelspec": {"display_name": "Python 3",
                                        "language": "python",
                                        "name": "python3"},
                         "language_info": {"name": "python"}},
            "nbformat": 4, "nbformat_minor": 5}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (relative to examples/)")
    ap.add_argument("--dataset", default="shapenet",
                    choices=["shapenet", "partnet"])
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()

    if args.dataset == "partnet":
        ckpt = args.ckpt or os.path.join(
            "..", "benchmarks", "_partnet_bottle_ckpt")
        out = os.path.join(ROOT, "examples", "partnet_eval.ipynb")
        nb = build_partnet(ckpt)
    else:
        ckpt = args.ckpt or DEFAULT_CKPT
        out = os.path.join(ROOT, "examples", "shapenet_eval.ipynb")
        nb = build(ckpt)
    with open(out, "w") as f:
        json.dump(nb, f, indent=1)
    print(f"wrote {out}")
    if args.execute:
        import subprocess

        subprocess.run(
            [sys.executable, "-m", "jupyter", "nbconvert", "--to", "notebook",
             "--execute", "--inplace",
             "--ExecutePreprocessor.timeout=1800", out],
            cwd=os.path.join(ROOT, "examples"), check=True)
        print("executed in place")


if __name__ == "__main__":
    main()
