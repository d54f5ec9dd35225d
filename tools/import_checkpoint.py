#!/usr/bin/env python
"""Convert a reference (torch/Lightning) checkpoint to an hpcs_tpu checkpoint.

Usage:
  python tools/import_checkpoint.py path/to/model.ckpt out_dir \
      --eucl_embedding 50 --hyp_embedding 50 --num_class 50 --k 10

Writes out_dir/model.ckpt (+config.json) loadable by infer.py / --resume.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--eucl_embedding", type=int, default=50)
    ap.add_argument("--hyp_embedding", type=int, default=50)
    ap.add_argument("--num_class", type=int, default=50)
    ap.add_argument("--num_categories", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--fixed_points", type=int, default=512)
    ap.add_argument("--model", default="vn_dgcnn_partseg")
    args = ap.parse_args()

    import jax
    import numpy as np

    from hpcs_tpu.models import HypHCSystem, ModelConfig, TrainState
    from hpcs_tpu.utils.checkpoint import save_checkpoint
    from hpcs_tpu.utils.torch_import import (
        convert_lightning_checkpoint,
        load_torch_state_dict,
    )

    cfg = ModelConfig(
        dataset="shapenet", model_name=args.model, num_class=args.num_class,
        num_categories=args.num_categories, fixed_points=args.fixed_points,
        eucl_dim=args.eucl_embedding, hyp_dim=args.hyp_embedding, k=args.k,
    )
    system = HypHCSystem(cfg)
    batch = {
        "points": np.zeros((1, args.fixed_points, 3), np.float32),
        "labels": np.zeros((1, args.fixed_points), np.int32),
        "category": np.zeros((1,), np.int32),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    sd = load_torch_state_dict(args.ckpt)
    params, stats = convert_lightning_checkpoint(
        sd, state.params, state.batch_stats, model_name=args.model
    )
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=state.opt_state, step=state.step)
    save_checkpoint(args.out_dir, state, cfg)
    print(f"imported {len(sd)} tensors -> {args.out_dir}")


if __name__ == "__main__":
    main()
