#!/usr/bin/env python
"""Noise-robustness toy harness (reference hpcs/utils/viz.py:470-523).

Sweeps additive jitter over synthetic multi-part clouds, decodes each with
the on-device linkage + best-k sweep, and saves a panel figure: ground
truth, prediction, Poincare-disk embedding, and score-vs-noise curve.

Usage:
    python examples/eval_noise.py [--ckpt DIR] [--out eval_noise.png]

Without --ckpt it evaluates an untrained model (the decode pipeline still
runs end to end; scores reflect random features, as in the reference's toy).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import matplotlib

matplotlib.use("Agg")
import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="", help="checkpoint dir (utils.checkpoint)")
    ap.add_argument("--out", default="eval_noise.png")
    ap.add_argument("--npoints", type=int, default=256)
    ap.add_argument("--noises", type=float, nargs="+",
                    default=[0.0, 0.04, 0.08, 0.12, 0.16])
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from hpcs_tpu.data import SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=2,
                      fixed_points=args.npoints, eucl_dim=8, hyp_dim=8, k=10,
                      t_per_anchor=8, num_triplets=4096, temperature=0.1,
                      test_rotation="none")
    system = HypHCSystem(cfg)
    batch0 = {"points": np.zeros((1, args.npoints, 3), np.float32),
              "labels": np.zeros((1, args.npoints), np.int32),
              "category": np.zeros((1,), np.int32)}
    state = system.init(jax.random.PRNGKey(0), batch0)
    if args.ckpt:
        from hpcs_tpu.utils.checkpoint import restore_checkpoint

        state, _, _ = restore_checkpoint(args.ckpt, state)

    n_rows = len(args.noises)
    fig, axes = plt.subplots(n_rows, 3, figsize=(12, 3.4 * n_rows),
                             squeeze=False)
    scores = []
    for r, noise in enumerate(args.noises):
        ds = SyntheticPartDataset(num_objects=1, npoints=args.npoints,
                                  num_categories=2, parts_per_object=3,
                                  seed=17, jitter=noise)
        pts, cat, seg = ds[0]
        batch = {"points": pts[None], "labels": seg[None].astype(np.int32),
                 "category": np.asarray([cat], np.int32)}
        logs, extras = system.test_step(state, batch, jax.random.PRNGKey(r),
                                        jnp.float32(cfg.temperature))
        pred = np.asarray(extras["pred"])[0]
        best_k = int(np.asarray(extras["best_k"])[0])
        score = float(np.asarray(extras["best_score"])[0])
        emb = np.asarray(extras["x_poincare"])[0]
        scores.append(score)

        for c, (colors, title) in enumerate([
            (seg, f"ground truth (noise {noise:.2f})"),
            (pred, f"prediction: {best_k} clusters, IoU {score:.2f}"),
        ]):
            ax = axes[r, c]
            ax.scatter(pts[:, 0], pts[:, 1], c=colors, s=4, cmap="tab10")
            ax.set_title(title, fontsize=9)
            ax.set_aspect("equal")
            ax.axis("off")
        ax = axes[r, 2]
        e2 = emb[:, :2] / (np.linalg.norm(emb, axis=1, keepdims=True).max() + 1e-9)
        ax.scatter(e2[:, 0], e2[:, 1], c=pred, s=4, cmap="tab10")
        ax.add_patch(plt.Circle((0, 0), 1.0, fill=False, lw=0.5))
        ax.set_xlim(-1.1, 1.1)
        ax.set_ylim(-1.1, 1.1)
        ax.set_title("Poincare embedding (first 2 dims)", fontsize=9)
        ax.axis("off")
        print(f"noise {noise:.2f}: best_k={best_k} score={score:.3f} "
              f"test_loss={float(logs['test_loss']):.3f}")

    fig.suptitle("decode robustness vs input jitter "
                 f"(scores: {['%.2f' % s for s in scores]})")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
