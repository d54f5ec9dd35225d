#!/usr/bin/env python
"""Convert a reference (torch/Lightning) checkpoint to an hpcs_tpu checkpoint.

Hyperparameters (embedding dims, num_class, k, model, loss settings) are
rehydrated from the checkpoint's own `hyper_parameters` payload — written by
the reference's `save_hyperparameters()`
(/root/reference/hpcs/models/base_hyp_hc.py:76) and normally consumed by
`load_from_checkpoint` (/root/reference/infer.py:43,59).  CLI flags are
OVERRIDES only; a bare

  python tools/import_checkpoint.py path/to/model.ckpt out_dir

imports any reference checkpoint (ShapeNet 50/50 or PartNet 4/4 alike) with
the correct dims.  Raw state_dict-only files (no hyper_parameters) fall back
to the flag values / their documented defaults.

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
    ap.add_argument("--eucl_embedding", type=int, default=None,
                    help="override ckpt euclidean_size (fallback default 50)")
    ap.add_argument("--hyp_embedding", type=int, default=None,
                    help="override ckpt hyp_size (fallback default 50)")
    ap.add_argument("--num_class", type=int, default=None)
    ap.add_argument("--num_categories", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--fixed_points", type=int, default=512)
    ap.add_argument("--model", default=None,
                    help="override ckpt backbone class (vn_dgcnn_partseg, ...)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from hpcs_tpu.models import HypHCSystem, ModelConfig, TrainState
    from hpcs_tpu.utils.checkpoint import save_checkpoint
    from hpcs_tpu.utils.torch_import import (
        convert_lightning_checkpoint,
        load_lightning_payload,
        reference_hparams_to_config_kwargs,
    )

    sd, payload = load_lightning_payload(args.ckpt)
    rehydrated = reference_hparams_to_config_kwargs(payload)
    if rehydrated:
        print("rehydrated from ckpt hyper_parameters: "
              + ", ".join(f"{k}={v}" for k, v in sorted(rehydrated.items())))
    else:
        print("no hyper_parameters in checkpoint; using flags/defaults")

    # layering: documented defaults < ckpt hparams < explicit CLI overrides
    kw = dict(dataset="shapenet", model_name="vn_dgcnn_partseg",
              num_class=50, num_categories=16, eucl_dim=50, hyp_dim=50, k=10)
    kw.update(rehydrated)
    overrides = {
        "eucl_dim": args.eucl_embedding, "hyp_dim": args.hyp_embedding,
        "num_class": args.num_class, "num_categories": args.num_categories,
        "k": args.k, "model_name": args.model,
    }
    kw.update({k: v for k, v in overrides.items() if v is not None})
    kw["fixed_points"] = args.fixed_points

    cfg = ModelConfig(**kw)
    system = HypHCSystem(cfg)
    batch = {
        "points": np.zeros((1, args.fixed_points, 3), np.float32),
        "labels": np.zeros((1, args.fixed_points), np.int32),
        "category": np.zeros((1,), np.int32),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    params, stats = convert_lightning_checkpoint(
        sd, state.params, state.batch_stats, model_name=cfg.model_name
    )
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=state.opt_state, step=state.step)
    save_checkpoint(args.out_dir, state, cfg)
    print(f"imported {len(sd)} tensors -> {args.out_dir} "
          f"(model={cfg.model_name}, eucl={cfg.eucl_dim}, hyp={cfg.hyp_dim}, "
          f"num_class={cfg.num_class}, k={cfg.k})")


if __name__ == "__main__":
    main()
