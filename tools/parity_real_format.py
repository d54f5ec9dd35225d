#!/usr/bin/env python
"""Converged quality parity on the REAL ShapeNet txt file format
(VERDICT r3 #3): train the reference (torch, via tools/ref_compat shims)
and hpcs_tpu to convergence on the same mini-ShapeNet files under
data/ShapeNet/raw — each stack through its OWN reader/loader pipeline
(file parsing, normalization, resampling included) — and record decode
best-k score + purity deltas across >= 2 seeds.

Spec: /root/reference/hpcs/models/base_hyp_hc.py:192-245 (test metrics),
hpcs/data/shapenet.py (reader).  North star: purity delta <= 0.5 %.

Stages:
    python tools/parity_real_format.py ref  [--seed S]
    python tools/parity_real_format.py jax  [--seed S]
    python tools/parity_real_format.py report
    python tools/parity_real_format.py all  [--seeds 0 1]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "benchmarks")
RAW = os.path.join(ROOT, "data", "ShapeNet", "raw")
OUT_JSON = os.path.join(BENCH, "parity_real_format.json")

sys.path.insert(0, os.path.join(ROOT, "tools"))
from parity_experiment import _ref_paths, purity_score  # noqa: E402

# The canonical ShapeNet recipe (/root/reference/run_train.sh, README:48-61)
# scaled to the mini dataset + CPU budget; ExpMap embedder (eucl == hyp),
# miner+cosface ON (the store_false defaults), SO(3) train/test rotation.
CFG = dict(
    npoints=256,
    batch_size=2,
    epochs=80,
    num_class=50,          # global ShapeNet part ids (labels here: 0-3, 6-7)
    num_categories=2,      # Airplane, Cap (the mini categories)
    class_choice=["Airplane", "Cap"],
    eucl_dim=16,
    hyp_dim=16,
    k=10,
    t_per_anchor=8,
    fraction=1.2,
    temperature=0.1,
    lr=0.05,
    margin=0.35,
    trade_off=0.1,
    train_rotation="so3",
    test_rotation="so3",
    seed=0,
)


def _json_path(side, seed):
    return os.path.join(BENCH, f"_parity_rf_{side}_s{seed}.json")


# ---------------------------------------------------------------- reference
def run_reference():
    _ref_paths()
    import torch
    from scipy.cluster.hierarchy import fcluster

    c = CFG
    torch.manual_seed(c["seed"])
    np.random.seed(c["seed"])

    from hpcs.data.shapenet import ShapeNetDataset as RefShapeNet
    from hpcs.models import ShapeNetHypHC
    from hpcs.nn.dgcnn import VN_DGCNN_partseg
    from hpcs.nn.hyperbolic.hyp_embed import ExpMap, MLPExpMap
    from hpcs.optim import RAdam
    from hpcs.utils.scores import get_optimal_k
    from torch.optim import lr_scheduler

    net = VN_DGCNN_partseg(in_channels=3, out_features=c["eucl_dim"], k=c["k"],
                           dropout=0.0, pooling="mean",
                           num_categories=c["num_categories"])
    emb = (ExpMap() if c["eucl_dim"] == c["hyp_dim"]
           else MLPExpMap(input_feat=c["eucl_dim"], out_feat=c["hyp_dim"]))
    model = ShapeNetHypHC(
        nn_feat=net, nn_emb=emb, euclidean_size=c["eucl_dim"],
        hyp_size=c["hyp_dim"], lr=c["lr"], margin=c["margin"],
        t_per_anchor=c["t_per_anchor"], fraction=c["fraction"],
        temperature=c["temperature"], num_class=c["num_class"],
        trade_off=c["trade_off"], miner=True, cosface=True,
        plot_inference=False, train_rotation=c["train_rotation"],
        test_rotation=c["test_rotation"],
    )
    model.num_categories = c["num_categories"]

    # the reference's OWN reader over the real txt files (in-RAM cache,
    # in-place normalize quirk and all — hpcs/data/shapenet.py)
    sets = {s: RefShapeNet(root=RAW, npoints=c["npoints"], split=s,
                           class_choice=c["class_choice"])
            for s in ("train", "val", "test")}

    B = c["batch_size"]
    rng = np.random.default_rng(c["seed"])

    def batches(split, shuffle_rng=None):
        ds = sets[split]
        order = np.arange(len(ds))
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        for s in range(0, len(order), B):
            items = [ds[int(i)] for i in order[s:s + B]]
            pts = np.stack([it[0][:, :3] for it in items])
            cat = np.stack([np.asarray(it[1]).reshape(-1) for it in items])
            seg = np.stack([it[2] for it in items])
            yield (torch.from_numpy(pts).float(),
                   torch.from_numpy(cat).long(),
                   torch.from_numpy(seg).long())

    opt = RAdam(model.parameters(), lr=c["lr"])
    sched = lr_scheduler.ReduceLROnPlateau(opt, mode="min", factor=0.5,
                                           patience=4, min_lr=1e-6)
    train_curve, val_curve = [], []
    t_start = time.time()
    for epoch in range(c["epochs"]):
        model.train()
        ep = []
        for bi, batch in enumerate(batches("train", rng)):
            opt.zero_grad()
            out = model.training_step(batch, bi)
            out["loss"].backward()
            opt.step()
            ep.append(float(out["loss"].detach()))
        model.eval()
        vl = []
        for bi, batch in enumerate(batches("val")):
            with torch.no_grad():
                vout = model.validation_step(batch, bi)
            vl.append(float(vout["val_loss"]))
        sched.step(float(np.mean(vl)))
        train_curve.append(float(np.mean(ep)))
        val_curve.append(float(np.mean(vl)))
        if epoch % 10 == 0 or epoch == c["epochs"] - 1:
            print(f"[ref s{c['seed']}] epoch {epoch}: "
                  f"train={train_curve[-1]:.4f} val={val_curve[-1]:.4f} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
    train_wall = time.time() - t_start

    model.eval()
    torch.manual_seed(c["seed"] + 777)
    scores, purities, accs, ious, tlosses = [], [], [], [], []
    with torch.no_grad():
        for bi, batch in enumerate(batches("test")):
            (losses, metrics, x_e, x_p, linkage_matrix, points,
             targets) = model.forward(batch, testing=True)
            tlosses.append(float(sum(l for l in losses.values())))
            accs.append(float(metrics["acc"]))
            ious.append(float(metrics["iou"]))
            for oi in range(points.size(0)):
                y = targets[oi].cpu()
                Z = linkage_matrix[oi]
                _, _, best_score = get_optimal_k(y, Z, "iou")
                scores.append(float(best_score))
                k_true = len(np.unique(y.numpy()))
                y_pred = fcluster(Z, k_true, criterion="maxclust") - 1
                purities.append(purity_score(y.numpy(), y_pred))

    result = {
        "train_loss_curve": train_curve, "val_loss_curve": val_curve,
        "train_wall_s": train_wall,
        "test_loss": float(np.mean(tlosses)),
        "test_acc": float(np.mean(accs)), "test_iou": float(np.mean(ious)),
        "decode_score_mean": float(np.mean(scores)),
        "decode_purity_mean": float(np.mean(purities)),
        "n_test_objects": len(scores),
    }
    with open(_json_path("ref", CFG["seed"]), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[ref s{c['seed']}] "
          f"{json.dumps({k: v for k, v in result.items() if 'curve' not in k})}")


# --------------------------------------------------------------------- jax
def run_jax():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hpcs_tpu import trainer as tpu_trainer
    from hpcs_tpu.data import DataLoader, ShapeNetDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    c = CFG
    # our OWN reader/loader over the same files (C++ txt parser, per-item
    # RNG resampling)
    train_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="train")
    val_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="val")
    test_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="test")
    train_loader = DataLoader(train_ds, c["batch_size"], shuffle=True,
                              seed=c["seed"])
    val_loader = DataLoader(val_ds, c["batch_size"])
    test_loader = DataLoader(test_ds, c["batch_size"])

    cfg = ModelConfig(
        dataset="shapenet", model_name="vn_dgcnn_partseg",
        num_class=c["num_class"], num_categories=c["num_categories"],
        fixed_points=c["npoints"], eucl_dim=c["eucl_dim"],
        hyp_dim=c["hyp_dim"], k=c["k"], t_per_anchor=c["t_per_anchor"],
        fraction=c["fraction"],
        num_triplets=c["npoints"] * c["batch_size"] * c["t_per_anchor"],
        temperature=c["temperature"], lr=c["lr"], margin=c["margin"],
        trade_off=c["trade_off"], miner=True, cosface=True,
        train_rotation=c["train_rotation"], test_rotation=c["test_rotation"],
    )
    system = HypHCSystem(cfg)
    t0 = time.time()
    state, _ = tpu_trainer.fit(
        system, train_loader, val_loader, epochs=c["epochs"],
        patience=10 ** 6, seed=c["seed"],
        log_dir=os.path.join(BENCH, "_parity_logs"),
        run_name=f"parity_rf_jax_s{c['seed']}",
    )
    train_wall = time.time() - t0

    from scipy.cluster.hierarchy import fcluster

    key = jax.random.PRNGKey(c["seed"] + 777)
    scores, purities, tlosses, accs, ious = [], [], [], [], []
    ckpt_dir = os.path.join(BENCH, "_parity_logs",
                            f"parity_rf_jax_s{c['seed']}", "checkpoints",
                            "final")
    from hpcs_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(ckpt_dir, state, cfg)
    for bi, batch in enumerate(test_loader):
        key = jax.random.fold_in(key, bi)
        logs, extras = system.test_step(state, batch, key,
                                        jnp.float32(system.temperature))
        tlosses.append(float(logs["test_loss"]))
        accs.append(float(logs["test_acc"]))
        ious.append(float(logs["test_iou"]))
        Zs = np.asarray(extras["linkage"])
        bscores = np.asarray(extras["best_score"])
        for oi in range(Zs.shape[0]):
            scores.append(float(bscores[oi]))
            y = batch["labels"][oi]
            k_true = len(np.unique(y))
            y_pred = fcluster(Zs[oi], k_true, criterion="maxclust") - 1
            purities.append(purity_score(y, y_pred))

    result = {
        "train_wall_s": train_wall,
        "test_loss": float(np.mean(tlosses)),
        "test_acc": float(np.mean(accs)), "test_iou": float(np.mean(ious)),
        "decode_score_mean": float(np.mean(scores)),
        "decode_purity_mean": float(np.mean(purities)),
        "n_test_objects": len(scores),
        "checkpoint": ckpt_dir,
    }
    with open(_json_path("jax", CFG["seed"]), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[jax s{c['seed']}] "
          f"{json.dumps({k: v for k, v in result.items() if 'curve' not in k})}")


# ------------------------------------------------------------------ report
def report(seeds):
    import glob

    runs = {"ref": [], "jax": []}
    for side in runs:
        for s in seeds:
            p = _json_path(side, s)
            if os.path.exists(p):
                with open(p) as f:
                    runs[side].append({"seed": s, **json.load(f)})
    if not runs["ref"] or not runs["jax"]:
        raise SystemExit("missing per-seed results; run the ref/jax stages first")

    def agg(side, key):
        vals = [r[key] for r in runs[side]]
        return {"mean": float(np.mean(vals)), "per_seed": vals}

    out = {
        "description": "Converged train+decode parity on the real ShapeNet "
                       "txt format (mini dataset, each stack through its own "
                       "reader), >= 2 seeds. North star: purity delta <= 0.5%.",
        "config": {k: v for k, v in CFG.items() if k != "seed"},
        "seeds": seeds,
        "reference": {k: agg("ref", k) for k in
                      ("decode_purity_mean", "decode_score_mean", "test_acc",
                       "test_iou", "train_wall_s")},
        "hpcs_tpu": {k: agg("jax", k) for k in
                     ("decode_purity_mean", "decode_score_mean", "test_acc",
                      "test_iou", "train_wall_s")},
    }
    d_pur = (out["hpcs_tpu"]["decode_purity_mean"]["mean"]
             - out["reference"]["decode_purity_mean"]["mean"])
    d_score = (out["hpcs_tpu"]["decode_score_mean"]["mean"]
               - out["reference"]["decode_score_mean"]["mean"])
    out["delta_purity_ours_minus_ref"] = d_pur
    out["delta_score_ours_minus_ref"] = d_score
    out["north_star_met"] = bool(d_pur >= -0.005)
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("delta_purity_ours_minus_ref",
                       "delta_score_ours_minus_ref", "north_star_met")}))
    print(f"wrote {OUT_JSON}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=["ref", "jax", "report", "all"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1],
                    help="seeds for report/all")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override CFG epochs (smoke testing)")
    args = ap.parse_args()

    if args.epochs is not None:
        CFG["epochs"] = args.epochs

    if args.stage == "report":
        report(args.seeds)
        return
    if args.stage == "all":
        for s in args.seeds:
            CFG["seed"] = s
            run_reference()
            run_jax()
        report(args.seeds)
        return
    CFG["seed"] = args.seed
    if args.stage == "ref":
        run_reference()
    else:
        run_jax()


if __name__ == "__main__":
    main()
