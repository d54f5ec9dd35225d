"""Checkpoint save/restore tests (msgpack single-file + orbax directory)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.data import DataLoader, SyntheticPartDataset
from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.utils.checkpoint import (
    load_config,
    restore_checkpoint,
    restore_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)

KEY = jax.random.PRNGKey(9)


@pytest.fixture(scope="module")
def trained():
    system = HypHCSystem(ModelConfig(
        dataset="shapenet", num_class=6, num_categories=2, fixed_points=64,
        eucl_dim=4, hyp_dim=4, k=8, t_per_anchor=5, num_triplets=256,
        temperature=0.1,
    ))
    ds = SyntheticPartDataset(num_objects=4, npoints=64, num_categories=2,
                              parts_per_object=3)
    batch = next(iter(DataLoader(ds, 2)))
    state = system.init(KEY, batch)
    state, _ = system.train_step(state, batch, KEY, jnp.float32(0.1))
    return system, state, batch


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.allclose(x, y) for x, y in zip(fa, fb))


def test_msgpack_roundtrip(tmp_path, trained):
    system, state, batch = trained
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, system.cfg, epoch=7)
    template = system.init(jax.random.PRNGKey(123), batch)  # different init
    restored, epoch, _ = restore_checkpoint(path, template)
    assert epoch == 7
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.batch_stats, state.batch_stats)
    assert int(restored.step) == int(state.step)


def test_config_snapshot_rehydrates(tmp_path, trained):
    system, state, _ = trained
    path = str(tmp_path / "ckpt2")
    save_checkpoint(path, state, system.cfg)
    cfg = load_config(path)
    assert cfg["num_class"] == 6
    assert cfg["model_name"] == "vn_dgcnn_partseg"
    cfg["hierarchy_list"] = ()
    rebuilt = ModelConfig(**cfg)
    assert rebuilt.k == system.cfg.k


def test_orbax_roundtrip(tmp_path, trained):
    system, state, batch = trained
    path = str(tmp_path / "ockpt")
    save_checkpoint_orbax(path, state)
    template = system.init(jax.random.PRNGKey(321), batch)
    restored = restore_checkpoint_orbax(path, template)
    assert _tree_equal(restored.params, state.params)


def test_save_checkpoint_orbax_path_roundtrips(tmp_path, trained):
    """The multi-host branch of save_checkpoint (use_orbax) restores through
    the same restore_checkpoint entry the trainer uses for --resume."""
    system, state, batch = trained
    path = str(tmp_path / "mh")
    save_checkpoint(path, state, system.cfg, epoch=3, use_orbax=True)
    template = system.init(jax.random.PRNGKey(321), batch)
    restored, epoch, _ = restore_checkpoint(path, template)
    assert epoch == 3
    assert _tree_equal(restored.params, state.params)
    assert load_config(path)["num_class"] == 6
