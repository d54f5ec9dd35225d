#!/usr/bin/env python
"""API tour: the library layers without the CLI.

Runs on CPU or TPU; uses procedural clouds.  Walks geometry -> backbone ->
loss -> training -> decode, printing shapes and scores at each step.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from hpcs_tpu.data import DataLoader, SyntheticPartDataset
from hpcs_tpu.decode import get_optimal_k, linkage
from hpcs_tpu.geometry import expmap0, hyp_dist_o, hyp_lca
from hpcs_tpu.loss.hyphc import normalize_to_radius
from hpcs_tpu.models import HypHCSystem, ModelConfig

key = jax.random.PRNGKey(0)

# --- 1. geometry: points on the Poincare ball -------------------------------
u = jax.random.normal(key, (4, 2)) * 0.5
x = expmap0(u)
print("ball points:", x.shape, "norms:", jnp.linalg.norm(x, axis=-1))
print("LCA depth of first pair:", float(hyp_lca(x[0], x[1], return_coord=False)[0]))
print("depth from origin:", hyp_dist_o(x)[:, 0])

# --- 2. a system: backbone + embedder + losses ------------------------------
cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=2,
                  fixed_points=128, eucl_dim=8, hyp_dim=8, k=10,
                  temperature=0.1, t_per_anchor=20, lr=0.05, trade_off=0.1,
                  num_triplets=8192)
system = HypHCSystem(cfg)
ds = SyntheticPartDataset(num_objects=16, npoints=128, num_categories=2,
                          parts_per_object=3)
loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
batch = next(iter(loader))
state = system.init(key, batch)
print("params:", sum(x.size for x in jax.tree_util.tree_leaves(state.params)), "weights")

# --- 3. train a few epochs ---------------------------------------------------
for epoch in range(80):
    for i, b in enumerate(loader):
        state, logs = system.train_step(
            state, b, jax.random.fold_in(key, epoch * 100 + i), jnp.float32(0.1)
        )
print(f"after training: total_loss={float(logs['total_loss']):.3f} "
      f"acc={float(logs.get('acc', 0)):.3f}")

# --- 4. decode a hierarchy on device ----------------------------------------
logs, extras = system.test_step(state, batch, key, jnp.float32(0.1))
print(f"decode: mean best-k IoU score={float(logs['score']):.3f}")

# or by hand, for one object:
emb = normalize_to_radius(extras["x_poincare"][0], state.params["scale"][0])
Z = linkage(emb, method="complete", metric="cosine")
pred, k, score = get_optimal_k(jnp.asarray(batch["labels"][0]), Z,
                               num_class=cfg.num_class)
print(f"object 0: best k={int(k)}, score={float(score):.3f}")
