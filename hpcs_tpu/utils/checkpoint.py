"""Checkpoint save/restore.

Reference behavior: Lightning writes a single `model.ckpt` with hparams
rehydration (/root/reference/train.py:285-286, base_hyp_hc.py:76) plus a
config.yaml snapshot per run.  Here: orbax for the sharded/async TPU path
(directory checkpoints of the full TrainState) and a single-file msgpack
fallback (`model.ckpt`) for portability; both store a config.json snapshot
so `load_from_checkpoint`-style rehydration works without the original CLI.
"""
import dataclasses
import json
import os

import flax
import jax
import numpy as np


def _config_dict(cfg):
    d = dataclasses.asdict(cfg)
    return d


def save_checkpoint(path, state, cfg, epoch=0, extra=None):
    """Save TrainState + config.  `path` is a directory (orbax) created on
    demand; a portable single-file `model.ckpt` is written inside it too."""
    os.makedirs(path, exist_ok=True)
    payload = {
        "state": jax.device_get(state),
        "epoch": epoch,
        "extra": extra or {},
    }
    with open(os.path.join(path, "model.ckpt"), "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_config_dict(cfg), f, indent=2, default=str)


def load_config(path):
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def restore_checkpoint(path, template_state):
    """Restore into a template TrainState (from system.init on a sample
    batch) — the flax analogue of load_from_checkpoint."""
    ckpt_file = path if os.path.isfile(path) else os.path.join(path, "model.ckpt")
    with open(ckpt_file, "rb") as f:
        payload = flax.serialization.from_bytes(
            {"state": template_state, "epoch": 0, "extra": {}}, f.read()
        )
    return payload["state"], payload["epoch"], payload.get("extra", {})


def save_checkpoint_orbax(path, state):
    """Async-capable orbax checkpoint of the TrainState (directory format)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "orbax"), jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path, template_state):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, "orbax"), target=template_state)
