"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.data import DataLoader, SyntheticPartDataset
from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.parallel import (
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)

KEY = jax.random.PRNGKey(2)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _system():
    return HypHCSystem(ModelConfig(
        dataset="shapenet", num_class=6, num_categories=2, fixed_points=64,
        eucl_dim=4, hyp_dim=4, k=8, t_per_anchor=5, num_triplets=512,
        temperature=0.1, lr=0.01,
    ))


def _batch(B):
    ds = SyntheticPartDataset(num_objects=B, npoints=64, num_categories=2,
                              parts_per_object=3)
    return next(iter(DataLoader(ds, B)))


def test_dp_step_runs_on_8_devices():
    system = _system()
    mesh = make_mesh(8)
    batch = _batch(8)
    state = system.init(KEY, batch)
    step = make_data_parallel_train_step(system, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    new_state, logs = step(state, sharded, KEY, jnp.float32(0.1))
    assert np.isfinite(float(logs["total_loss"]))
    assert int(new_state.step) == 1


def _assert_replicated(x, name):
    """Every device's buffer must hold identical values.  out_specs=P() with
    replication checking disabled keeps each device's own computed copy, so
    comparing addressable shards detects real per-device drift."""
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    assert len(shards) == 8, f"{name}: expected 8 per-device shards"
    for i, s in enumerate(shards[1:], 1):
        np.testing.assert_array_equal(
            shards[0], s, err_msg=f"{name} diverged between device 0 and {i}")


def test_dp_params_stay_replicated():
    system = _system()
    mesh = make_mesh(8)
    batch = _batch(8)
    state = system.init(KEY, batch)
    step = make_data_parallel_train_step(system, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    new_state, _ = step(state, sharded, KEY, jnp.float32(0.1))
    # pmean'd grads -> every device applies the same update -> all per-device
    # copies of every leaf (params + opt_state moments) must stay bitwise equal
    _assert_replicated(new_state.params["cosface_W"], "cosface_W")
    _assert_replicated(new_state.params["scale"], "scale")
    leaves = jax.tree_util.tree_leaves_with_path(new_state.params)
    for path, leaf in leaves[:6]:
        _assert_replicated(leaf, jax.tree_util.keystr(path))
    assert np.all(np.isfinite(np.asarray(new_state.params["cosface_W"])))
    # second step from the returned state must also work and stay replicated
    new_state2, logs2 = step(new_state, sharded, jax.random.fold_in(KEY, 1),
                             jnp.float32(0.1))
    assert np.isfinite(float(logs2["total_loss"]))
    _assert_replicated(new_state2.params["cosface_W"], "cosface_W@step2")


def test_dp_loss_comparable_to_single_device():
    """DP loss (mean of per-shard losses) should be in the same ballpark as
    the single-device loss on the same batch (different triplet draws)."""
    system = _system()
    mesh = make_mesh(8)
    batch = _batch(8)
    state = system.init(KEY, batch)
    _, logs_single = system.train_step(state, batch, KEY, jnp.float32(0.1))
    step = make_data_parallel_train_step(system, mesh=mesh)
    _, logs_dp = step(state, shard_batch(mesh, batch), KEY, jnp.float32(0.1))
    a = float(logs_single["total_loss"])
    b = float(logs_dp["total_loss"])
    assert abs(a - b) / max(abs(a), 1e-6) < 0.35


def test_dp_training_reduces_loss():
    system = _system()
    mesh = make_mesh(8)
    batch = _batch(8)
    state = system.init(KEY, batch)
    step = make_data_parallel_train_step(system, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    losses = []
    key = KEY
    for i in range(6):
        key = jax.random.fold_in(key, i)
        state, logs = step(state, sharded, key, jnp.float32(0.1))
        losses.append(float(logs["total_loss"]))
    assert losses[-1] < losses[0]


def test_mesh_sizes():
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        assert mesh.devices.size == n


def test_dp_test_step_matches_single_device():
    """Sharded decode must reproduce the single-device decode exactly when
    test rotation is off (per-object work is independent)."""
    system = HypHCSystem(ModelConfig(
        dataset="shapenet", num_class=6, num_categories=2, fixed_points=64,
        eucl_dim=4, hyp_dim=4, k=8, t_per_anchor=5, num_triplets=512,
        temperature=0.1, lr=0.01, test_rotation="none",
    ))
    mesh = make_mesh(8)
    batch = _batch(8)
    state = system.init(KEY, batch)
    from hpcs_tpu.parallel import make_data_parallel_test_step

    logs_s, extras_s = system.test_step(state, batch, KEY, jnp.float32(0.1))
    step = make_data_parallel_test_step(system, mesh=mesh)
    logs_dp, extras_dp = step(state, shard_batch(mesh, batch), KEY, jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(extras_dp["best_score"]),
                               np.asarray(extras_s["best_score"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(extras_dp["best_k"]),
                                  np.asarray(extras_s["best_k"]))
    np.testing.assert_array_equal(np.asarray(extras_dp["pred"]),
                                  np.asarray(extras_s["pred"]))
    assert abs(float(logs_dp["score"]) - float(logs_s["score"])) < 1e-5
