#!/usr/bin/env python
"""Converged quality parity on the REAL dataset file formats
(VERDICT r3 #3, r4 #3): train the reference (torch, via tools/ref_compat
shims) and hpcs_tpu to convergence on the same mini dataset files — each
stack through its OWN reader/loader pipeline (file parsing, normalization,
resampling included) — and record decode best-k score + purity deltas
across >= 4 seeds.

Datasets:
  shapenet — mini-ShapeNet txt under data/ShapeNet/raw (Airplane, Cap),
    plain CosFace.  Spec: /root/reference/hpcs/models/base_hyp_hc.py:192-245,
    hpcs/data/shapenet.py.
  partnet — mini-PartNet h5 under data/PartNet (Bottle, level 3),
    HIERARCHICAL CosFace over levels [1, 3].  Spec:
    /root/reference/hpcs/models/partnet_hyp_hc.py:57-67,
    hpcs/loss/hierarchical_cosface_loss.py:9-87, hpcs/data/partnet.py.

North star: purity delta <= 0.5 % (BASELINE.json).

Accuracy columns (VERDICT r4 #4): `test_acc` mirrors the reference exactly —
top-1 over MARGIN-PENALIZED CosFace logits (the true class's cosine is
lowered by 0.35 before argmax; ultrametric_loss.py:95-112), so a weakly
separated model scores 0 even when the plain cosine argmax is right.
`test_acc_nomargin` is top-1 over the raw cosine logits and is the
diagnostic that distinguishes "margin-suppressed" (nomargin > 0) from
"label-space misalignment" (nomargin ~ chance).

Stages:
    python tools/parity_real_format.py ref  [--dataset shapenet] [--seed S]
    python tools/parity_real_format.py jax  [--dataset shapenet] [--seed S]
    python tools/parity_real_format.py report [--dataset shapenet]
    python tools/parity_real_format.py all  [--dataset partnet] [--seeds 0 1 2 3]
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
PN_H5 = os.path.join(ROOT, "data", "PartNet", "sem_seg_h5")
PN_HIER = os.path.join(ROOT, "data", "PartNet", "after_merging_label_ids")

sys.path.insert(0, os.path.join(ROOT, "tools"))
from parity_experiment import _ref_paths, purity_score  # noqa: E402

# The canonical recipes (/root/reference/run_train.sh for ShapeNet;
# /root/reference/checkpoints/partnet/Bottle/config.yaml for PartNet)
# scaled to the mini datasets + CPU budget; ExpMap embedder (eucl == hyp),
# miner+cosface ON (the store_false defaults), SO(3) train/test rotation.
CFGS = {
    "shapenet": dict(
        npoints=256,
        batch_size=2,
        epochs=80,
        num_class=50,      # global ShapeNet part ids (labels here: 0-3, 6-7)
        num_categories=2,  # Airplane, Cap (the mini categories)
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
    ),
    "partnet": dict(
        npoints=256,
        batch_size=2,
        epochs=80,
        category="Bottle",
        level=3,
        num_class=9,       # len(Bottle-level-3.txt) + 1, like the reference
        num_categories=1,  # dummy single category (partnet_hyp_hc.py:102)
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
    ),
}


def _json_path(dataset, side, seed):
    tag = "" if dataset == "shapenet" else "_pn"
    return os.path.join(BENCH, f"_parity_rf{tag}_{side}_s{seed}.json")


def _out_json(dataset):
    tag = "" if dataset == "shapenet" else "_partnet"
    return os.path.join(BENCH, f"parity_real_format{tag}.json")


def _partnet_levels():
    return [i + 1 for i in range(3)
            if os.path.exists(os.path.join(
                PN_H5, f"Bottle-{i + 1}", "train_files.txt"))]


# ---------------------------------------------------------------- reference
def _ref_acc_nomargin(model, x_poincare_flat, labels_flat):
    """Top-1 over RAW cosine (no margin penalty): W from the PML CosFace
    head, cos = norm(emb) @ norm(W)."""
    import torch
    import torch.nn.functional as F

    W = model.metric_hyp_loss.loss_cosface.W  # [emb, classes]
    with torch.no_grad():
        cos = F.normalize(x_poincare_flat, dim=1) @ F.normalize(
            W.to(x_poincare_flat.dtype), dim=0)
        return float((cos.argmax(1) == labels_flat).float().mean())


def run_reference(dataset):
    _ref_paths()
    import torch
    from scipy.cluster.hierarchy import fcluster

    c = CFGS[dataset]
    torch.manual_seed(c["seed"])
    np.random.seed(c["seed"])

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

    if dataset == "shapenet":
        from hpcs.data.shapenet import ShapeNetDataset as RefShapeNet
        from hpcs.models import ShapeNetHypHC

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
    else:
        import hpcs.data.hierarchy_list as hl
        from pathlib import Path

        from hpcs.data.partnet import PartNetDataset as RefPartNet
        from hpcs.models import PartNetHypHC

        # the reference hard-codes HIERARCHY_ROOT to its own data/ tree
        # (hpcs/utils/data.py:20-22), which is read-only here — point the
        # module constant at our mini after_merging_label_ids instead
        hl.HIERARCHY_ROOT = Path(PN_HIER)
        hierarchy_list = hl.get_hierarchy_list(
            c["category"], _partnet_levels())
        model = PartNetHypHC(
            nn_feat=net, nn_emb=emb, euclidean_size=c["eucl_dim"],
            hyp_size=c["hyp_dim"], lr=c["lr"], margin=c["margin"],
            t_per_anchor=c["t_per_anchor"], fraction=c["fraction"],
            temperature=c["temperature"], num_class=c["num_class"],
            trade_off=c["trade_off"], miner=True, cosface=True,
            hierarchical=True, hierarchy_list=hierarchy_list,
            plot_inference=False, train_rotation=c["train_rotation"],
            test_rotation=c["test_rotation"],
        )
        base = os.path.join(PN_H5, f"{c['category']}-{c['level']}")
        sets = {s: RefPartNet(os.path.join(base, f"{s}_files.txt"),
                              c["npoints"])
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
            if dataset == "shapenet":
                pts = np.stack([it[0][:, :3] for it in items])
                cat = np.stack([np.asarray(it[1]).reshape(-1) for it in items])
                seg = np.stack([it[2] for it in items])
                yield (torch.from_numpy(pts).float(),
                       torch.from_numpy(cat).long(),
                       torch.from_numpy(seg).long())
            else:
                pts = np.stack([it[0][:, :3] for it in items])
                seg = np.stack([it[1] for it in items])
                yield (torch.from_numpy(pts).float(),
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
            print(f"[ref {dataset} s{c['seed']}] epoch {epoch}: "
                  f"train={train_curve[-1]:.4f} val={val_curve[-1]:.4f} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
    train_wall = time.time() - t_start

    model.eval()
    torch.manual_seed(c["seed"] + 777)
    scores, purities, accs, accs_nm, ious, tlosses = [], [], [], [], [], []
    with torch.no_grad():
        for bi, batch in enumerate(batches("test")):
            (losses, metrics, x_e, x_p, linkage_matrix, points,
             targets) = model.forward(batch, testing=True)
            tlosses.append(float(sum(l for l in losses.values())))
            accs.append(float(metrics["acc"]))
            ious.append(float(metrics["iou"]))
            accs_nm.append(_ref_acc_nomargin(
                model, x_p.contiguous().view(-1, x_p.shape[-1]),
                targets.contiguous().reshape(-1)))
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
        "test_acc_nomargin": float(np.mean(accs_nm)),
        "decode_score_mean": float(np.mean(scores)),
        "decode_purity_mean": float(np.mean(purities)),
        "n_test_objects": len(scores),
    }
    with open(_json_path(dataset, "ref", c["seed"]), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[ref {dataset} s{c['seed']}] "
          f"{json.dumps({k: v for k, v in result.items() if 'curve' not in k})}")


# --------------------------------------------------------------------- jax
def run_jax(dataset):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hpcs_tpu import trainer as tpu_trainer
    from hpcs_tpu.data import DataLoader, PartNetDataset, ShapeNetDataset
    from hpcs_tpu.data.hierarchy import get_hierarchy_list
    from hpcs_tpu.loss.cosface import cosface_logits
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    c = CFGS[dataset]
    if dataset == "shapenet":
        # our OWN reader/loader over the same files (C++ txt parser, per-item
        # RNG resampling)
        train_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="train")
        val_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="val")
        test_ds = ShapeNetDataset(RAW, npoints=c["npoints"], split="test")
        hierarchy_list = ()
    else:
        base = os.path.join(PN_H5, f"{c['category']}-{c['level']}")
        train_ds = PartNetDataset(os.path.join(base, "train_files.txt"),
                                  c["npoints"])
        val_ds = PartNetDataset(os.path.join(base, "val_files.txt"),
                                c["npoints"])
        test_ds = PartNetDataset(os.path.join(base, "test_files.txt"),
                                 c["npoints"])
        hierarchy_list = get_hierarchy_list(
            PN_HIER, c["category"], _partnet_levels())
    train_loader = DataLoader(train_ds, c["batch_size"], shuffle=True,
                              seed=c["seed"])
    val_loader = DataLoader(val_ds, c["batch_size"])
    test_loader = DataLoader(test_ds, c["batch_size"])

    def _freeze(h):
        return tuple(tuple(tuple(ch) for ch in lvl) for lvl in h)

    cfg = ModelConfig(
        dataset=dataset, model_name="vn_dgcnn_partseg",
        num_class=c["num_class"], num_categories=c["num_categories"],
        fixed_points=c["npoints"], eucl_dim=c["eucl_dim"],
        hyp_dim=c["hyp_dim"], k=c["k"], t_per_anchor=c["t_per_anchor"],
        fraction=c["fraction"],
        num_triplets=c["npoints"] * c["batch_size"] * c["t_per_anchor"],
        temperature=c["temperature"], lr=c["lr"], margin=c["margin"],
        trade_off=c["trade_off"], miner=True, cosface=True,
        hierarchical=dataset == "partnet",
        hierarchy_list=_freeze(hierarchy_list),
        train_rotation=c["train_rotation"], test_rotation=c["test_rotation"],
    )
    system = HypHCSystem(cfg)
    run_tag = ("parity_rf_jax" if dataset == "shapenet"
               else "parity_rf_pn_jax")
    t0 = time.time()
    state, _ = tpu_trainer.fit(
        system, train_loader, val_loader, epochs=c["epochs"],
        patience=10 ** 6, seed=c["seed"],
        log_dir=os.path.join(BENCH, "_parity_logs"),
        run_name=f"{run_tag}_s{c['seed']}",
    )
    train_wall = time.time() - t0

    from scipy.cluster.hierarchy import fcluster

    key = jax.random.PRNGKey(c["seed"] + 777)
    scores, purities, tlosses, accs, accs_nm, ious = [], [], [], [], [], []
    ckpt_dir = os.path.join(BENCH, "_parity_logs",
                            f"{run_tag}_s{c['seed']}", "checkpoints",
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
        flat = extras["x_poincare"].reshape(-1, extras["x_poincare"].shape[-1])
        labels_flat = jnp.asarray(batch["labels"]).reshape(-1)
        raw = cosface_logits(state.params["cosface_W"], flat, labels_flat,
                             margin=0.0, scale=1.0)
        accs_nm.append(float(jnp.mean(
            (jnp.argmax(raw, -1) == labels_flat).astype(jnp.float32))))
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
        "test_acc_nomargin": float(np.mean(accs_nm)),
        "decode_score_mean": float(np.mean(scores)),
        "decode_purity_mean": float(np.mean(purities)),
        "n_test_objects": len(scores),
        "checkpoint": ckpt_dir,
    }
    with open(_json_path(dataset, "jax", c["seed"]), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[jax {dataset} s{c['seed']}] "
          f"{json.dumps({k: v for k, v in result.items() if 'curve' not in k})}")


# ------------------------------------------------------------------ report
def report(dataset, seeds):
    runs = {"ref": [], "jax": []}
    for side in runs:
        for s in seeds:
            p = _json_path(dataset, side, s)
            if os.path.exists(p):
                with open(p) as f:
                    runs[side].append({"seed": s, **json.load(f)})
    if not runs["ref"] or not runs["jax"]:
        raise SystemExit("missing per-seed results; run the ref/jax stages first")

    def agg(side, key):
        vals = [r[key] for r in runs[side] if key in r]
        if not vals:
            return None
        std = float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0
        return {"mean": float(np.mean(vals)), "std": std,
                "stderr": std / np.sqrt(len(vals)) if len(vals) > 1 else 0.0,
                "per_seed": vals}

    keys = ("decode_purity_mean", "decode_score_mean", "test_acc",
            "test_acc_nomargin", "test_iou", "train_wall_s")
    out = {
        "description": f"Converged train+decode parity on the real "
                       f"{dataset} file format (mini dataset, each stack "
                       f"through its own reader), seeds {list(seeds)}. "
                       "North star: purity delta <= 0.5%.",
        "config": {k: v for k, v in CFGS[dataset].items() if k != "seed"},
        "seeds": list(seeds),
        "reference": {k: agg("ref", k) for k in keys},
        "hpcs_tpu": {k: agg("jax", k) for k in keys},
    }

    def delta_with_significance(key):
        a, b = out["hpcs_tpu"][key], out["reference"][key]
        if a is None or b is None:
            return None
        d = a["mean"] - b["mean"]
        se = float(np.hypot(a["stderr"], b["stderr"]))
        z = d / se if se > 0 else 0.0
        return {"delta_ours_minus_ref": d, "combined_stderr": se,
                "z": z,
                "verdict": ("ours ahead (significant)" if z > 2 else
                            "ref ahead (significant)" if z < -2 else
                            "statistically indistinguishable "
                            "(unpaired seeds, |z| < 2)")}

    out["purity"] = delta_with_significance("decode_purity_mean")
    out["score"] = delta_with_significance("decode_score_mean")
    d_pur = out["purity"]["delta_ours_minus_ref"]
    # north star is NOT-WORSE (<= 0.5 pp below ref), judged on the mean but
    # with the honest caveat carried in the verdict string above
    out["north_star_met"] = bool(d_pur >= -0.005)
    with open(_out_json(dataset), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"dataset": dataset,
                      "purity": out["purity"],
                      "score": out["score"],
                      "north_star_met": out["north_star_met"]}))
    print(f"wrote {_out_json(dataset)}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=["ref", "jax", "report", "all"])
    ap.add_argument("--dataset", choices=["shapenet", "partnet"],
                    default="shapenet")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1],
                    help="seeds for report/all")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override CFG epochs (smoke testing)")
    args = ap.parse_args()

    c = CFGS[args.dataset]
    if args.epochs is not None:
        c["epochs"] = args.epochs

    if args.stage == "report":
        report(args.dataset, args.seeds)
        return
    if args.stage == "all":
        for s in args.seeds:
            c["seed"] = s
            run_reference(args.dataset)
            run_jax(args.dataset)
        report(args.dataset, args.seeds)
        return
    c["seed"] = args.seed
    if args.stage == "ref":
        run_reference(args.dataset)
    else:
        run_jax(args.dataset)


if __name__ == "__main__":
    main()
