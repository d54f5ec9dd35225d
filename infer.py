#!/usr/bin/env python
"""Inference/decode CLI with shapenet/partnet/synthetic subcommands.

Mirrors /root/reference/infer.py:64-90 (subparsers, --model_path,
--test_batches, --fixed_points, rotation flags); checkpoints are local
directories (the reference's wandb.restore fallback becomes a plain path
check, infer.py:15-24).
"""
import argparse
import os


def check_model_path(model_path):
    if model_path.startswith("wandb:"):
        return fetch_wandb_checkpoint(model_path[len("wandb:"):])
    if os.path.exists(model_path):
        return model_path
    raise FileNotFoundError(
        f"checkpoint not found: {model_path} (expected a directory with "
        "model.ckpt + config.json, a model.ckpt file, or wandb:<run_path>)"
    )


def fetch_wandb_checkpoint(run_path, dest=None):
    """Migration route for reference checkpoints hosted on Weights & Biases
    (reference resume path: /root/reference/infer.py:15-24 wandb.restore).
    Downloads the Lightning model.ckpt + config.yaml from the run and
    converts them into this repo's local-directory format via
    tools/import_checkpoint.py — with NO dim flags: the importer rehydrates
    eucl/hyp dims, num_class, k and model from the checkpoint's own
    hyper_parameters payload (save_hyperparameters, base_hyp_hc.py:76), so
    ShapeNet 50/50 and PartNet 4/4 runs alike import correctly.  Requires
    the wandb package and network access; offline users should download
    model.ckpt themselves and run `python tools/import_checkpoint.py` on
    it."""
    import subprocess
    import sys

    try:
        import wandb
    except ImportError as e:
        raise RuntimeError(
            "wandb:<run_path> checkpoints need the wandb package; download "
            "model.ckpt manually and convert it with tools/import_checkpoint.py"
        ) from e
    dest = dest or os.path.join("wandb_ckpts", run_path.replace("/", "_"))
    os.makedirs(dest, exist_ok=True)
    wandb.restore("model.ckpt", run_path=run_path, root=dest)
    converted = os.path.join(dest, "imported")
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "tools",
                                      "import_checkpoint.py"),
         os.path.join(dest, "model.ckpt"), converted],
        check=True,
    )
    return converted


def build_args(sub, dataset):
    sub.add_argument('--model_path', '-model_path', type=str, required=True)
    sub.add_argument('--test_batches', '-test_batches', default=10, type=int)
    sub.add_argument('--batch', '-batch', default=2, type=int)
    sub.add_argument('--fixed_points', '-fixed_points', default=512, type=int)
    sub.add_argument('--test_rotation', '-test_rotation', default='so3', type=str)
    sub.add_argument('--plot_inference', action='store_true')
    sub.add_argument('--accelerator', '-accelerator', default='tpu', type=str)
    sub.add_argument('--seed', type=int, default=0)
    if dataset == 'partnet':
        sub.add_argument('--category', '-category', required=True, type=str)
        sub.add_argument('--level', '-level', default=3, type=int)
    elif dataset == 'shapenet':
        sub.add_argument('--category', '-category', default=None, type=str)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    subparsers = parser.add_subparsers(dest='dataset', required=True)
    for name in ('shapenet', 'partnet', 'synthetic'):
        build_args(subparsers.add_parser(name), name)
    args = parser.parse_args()

    from hpcs_tpu.cli import select_platform

    select_platform(args.accelerator)

    import jax

    from hpcs_tpu.data import DataLoader, PartNetDataset, ShapeNetDataset, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.trainer import test
    from hpcs_tpu.utils.checkpoint import load_config, restore_checkpoint

    path = check_model_path(args.model_path)
    cfg_dict = load_config(path if os.path.isdir(path) else os.path.dirname(path))
    cfg_dict["test_rotation"] = args.test_rotation
    cfg_dict["fixed_points"] = args.fixed_points

    def _freeze(h):
        return tuple(tuple(tuple(ch) for ch in lvl) for lvl in h)

    cfg_dict["hierarchy_list"] = _freeze(cfg_dict.get("hierarchy_list", ()))
    cfg = ModelConfig(**cfg_dict)
    system = HypHCSystem(cfg)

    if args.dataset == 'shapenet':
        ds = ShapeNetDataset(root='data/ShapeNet/raw', npoints=args.fixed_points,
                             split='test', class_choice=args.category)
    elif args.dataset == 'partnet':
        base = os.path.join('data/PartNet/sem_seg_h5', f'{args.category}-{args.level}')
        ds = PartNetDataset(os.path.join(base, 'test_files.txt'), args.fixed_points)
    else:
        ds = SyntheticPartDataset(num_objects=32, npoints=args.fixed_points, seed=3)

    loader = DataLoader(ds, args.batch, shuffle=True, drop_last=False, seed=args.seed)
    sample = next(iter(loader))
    state = system.init(jax.random.PRNGKey(args.seed), sample)
    state, _, _ = restore_checkpoint(path, state)

    plot_dir = os.path.join(os.path.dirname(path) or ".", "plots") if args.plot_inference else None
    results = test(system, state, loader, seed=args.seed,
                   limit_batches=args.test_batches, plot_dir=plot_dir)
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
