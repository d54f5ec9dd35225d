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


def test_sharded_decode_matches_vmap_on_identical_embeddings():
    """The DECODE itself is exactly reproducible under sharding: the same
    embeddings decoded per-device (shard_map over the batch) give bit-equal
    linkages, preds, best-k and scores to the single-device vmap.

    (The end-to-end test_step is checked to tolerance below instead: XLA
    compiles the B=8 forward and the per-device B=1 forward with different
    reduction orders, so embeddings differ at the ~1e-8 ULP level, and
    hierarchical clustering is chaotically sensitive to near-tie merges —
    bitwise equality across different batch shapes is not an XLA contract.)"""
    from jax.sharding import PartitionSpec as P

    from hpcs_tpu.decode import get_optimal_k
    from hpcs_tpu.parallel.data_parallel import _shard_map
    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    mesh = make_mesh(8)
    key = jax.random.PRNGKey(7)
    emb = jax.random.normal(key, (8, 64, 4)) * 0.1
    labels = jax.random.randint(key, (8, 64), 0, 6)

    def decode_one(e, l):
        Z = linkage_from_distances_mnn(cosine_distance_matrix(e))
        pred, k, s = get_optimal_k(l, Z, num_class=6, index="iou")
        return Z, pred, k, s

    single = jax.jit(jax.vmap(decode_one))(emb, labels)
    sharded_fn = jax.jit(_shard_map(
        jax.vmap(decode_one), mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data")))
    sharded = sharded_fn(shard_batch(mesh, {"x": emb})["x"],
                         shard_batch(mesh, {"y": labels})["y"])
    for name, a, b in zip(("Z", "pred", "k", "score"), single, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_dp_test_step_matches_single_device():
    """End-to-end sharded test_step agrees with single-device to decode-noise
    tolerance (embeddings differ at ULP level across batch shapes; see
    test_sharded_decode_matches_vmap_on_identical_embeddings for the exact
    decode contract)."""
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
    # embeddings agree to float noise; decode scores to near-tie flip noise
    np.testing.assert_allclose(np.asarray(extras_dp["x_poincare"]),
                               np.asarray(extras_s["x_poincare"]), atol=1e-6)
    assert abs(float(logs_dp["score"]) - float(logs_s["score"])) < 0.1
    # triplet pools are per-shard under DP (key folded by axis_index), so the
    # metric-loss part only agrees statistically
    np.testing.assert_allclose(float(logs_dp["test_loss"]),
                               float(logs_s["test_loss"]), rtol=0.1)


def test_fused_dp_epoch_matches_stepped_dp():
    """lax.scan of the shard_map DP step over a stacked epoch must reproduce
    the per-step DP loop state-for-state (same fold_in(key, gs+1) walk)."""
    from hpcs_tpu.parallel import make_data_parallel_epoch_fn

    system = _system()
    mesh = make_mesh(8)
    state0 = system.init(KEY, _batch(8))
    step = make_data_parallel_train_step(system, mesh=mesh)
    epoch_fn = make_data_parallel_epoch_fn(system, mesh=mesh)

    ds = SyntheticPartDataset(num_objects=24, npoints=64, num_categories=2,
                              parts_per_object=3, seed=3)
    batches = list(DataLoader(ds, 8, drop_last=True))
    temp = jnp.float32(0.1)

    # stepped reference
    key = KEY
    state_ref = state0
    gs = 0
    for b in batches:
        key = jax.random.fold_in(key, gs + 1)
        state_ref, logs_ref = step(state_ref, shard_batch(mesh, b), key, temp)
        gs += 1

    # fused
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    state_fused, key_fused, logs = epoch_fn(
        state0, KEY, stacked, jnp.int32(0), temp)

    assert logs["total_loss"].shape[0] == len(batches)
    np.testing.assert_array_equal(np.asarray(key_fused), np.asarray(key))
    for path, a in jax.tree_util.tree_leaves_with_path(state_ref.params):
        b = dict(jax.tree_util.tree_leaves_with_path(state_fused.params))[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0,
            err_msg=f"params diverged at {jax.tree_util.keystr(path)}")
    np.testing.assert_array_equal(
        np.asarray(state_ref.step), np.asarray(state_fused.step))
    # params must also remain replicated across devices after the fused epoch
    _assert_replicated(state_fused.params["cosface_W"], "cosface_W@fused")


def test_dp_step_handles_ragged_batch():
    """A batch not divisible by the mesh runs unsharded (single-device
    semantics) instead of crashing mid-epoch — trainer.fit's contract for
    drop_last=False loaders (ADVICE r3)."""
    system = _system()
    mesh = make_mesh(8)
    step = make_data_parallel_train_step(system, mesh=mesh)
    state = system.init(KEY, _batch(8))
    ragged = _batch(6)
    new_state, logs = step(state, ragged, KEY, jnp.float32(0.1))
    assert np.isfinite(float(logs["total_loss"]))
    assert int(new_state.step) == 1


def test_dp_epoch_fn_rejects_ragged_batch():
    """The fused DP epoch cannot fall back per-batch; a direct caller with
    an indivisible stacked batch gets a clear ValueError, not a cryptic
    device_put/NamedSharding failure (ADVICE r3)."""
    from hpcs_tpu.parallel import make_data_parallel_epoch_fn

    system = _system()
    mesh = make_mesh(8)
    epoch_fn = make_data_parallel_epoch_fn(system, mesh=mesh)
    state = system.init(KEY, _batch(8))
    b = _batch(6)
    stacked = {k: jnp.asarray(v)[None] for k, v in b.items()}  # [S=1, B=6, ...]
    with pytest.raises(ValueError, match="not divisible"):
        epoch_fn(state, KEY, stacked, jnp.int32(0), jnp.float32(0.1))
