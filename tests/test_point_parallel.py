"""Point-axis (sequence) parallelism: sharded forward == unsharded forward.

The kNN needs the global candidate set, so a naive shard would silently
compute local-only neighbors; these tests pin the GSPMD-sharded forward to
the single-device result (same math, collectives inserted by XLA)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.parallel import make_mesh_2d, make_point_sharded_forward

KEY = jax.random.PRNGKey(11)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _system(npoints=64, B=4):
    system = HypHCSystem(ModelConfig(
        dataset="shapenet", num_class=6, num_categories=2, fixed_points=npoints,
        eucl_dim=4, hyp_dim=4, k=8, t_per_anchor=5, num_triplets=512,
        temperature=0.1,
    ))
    batch = {
        "points": jax.random.normal(KEY, (B, npoints, 3)),
        "labels": jax.random.randint(KEY, (B, npoints), 0, 6),
        "category": jnp.zeros((B,), jnp.int32),
    }
    state = system.init(KEY, batch)
    dv = jax.nn.one_hot(batch["category"], 2)
    return system, state, batch, dv


def _reference_forward(system, state, batch, dv):
    return jax.jit(lambda p, bs, x, d: system.net.apply(
        {"params": p, "batch_stats": bs}, x, d, train=False))(
        state.params, state.batch_stats, batch["points"], dv)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_point_sharded_forward_matches_unsharded(shape):
    system, state, batch, dv = _system()
    xe_ref, xp_ref = _reference_forward(system, state, batch, dv)

    mesh = make_mesh_2d(*shape)
    fwd = make_point_sharded_forward(system, mesh)
    xe, xp = fwd(state.params, state.batch_stats, batch["points"], dv)
    assert xe.shape == xe_ref.shape and xp.shape == xp_ref.shape
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xe), np.asarray(xe_ref), atol=2e-5)


def test_point_sharded_output_sharding():
    system, state, batch, dv = _system()
    mesh = make_mesh_2d(2, 4)
    fwd = make_point_sharded_forward(system, mesh)
    xe, _ = fwd(state.params, state.batch_stats, batch["points"], dv)
    # the result stays sharded: batch over data, points over points
    spec = xe.sharding.spec
    assert tuple(spec) == ("data", "points", None) or tuple(spec)[:2] == ("data", "points")


def test_point_sharded_train_step_matches_unsharded():
    """Grads/params from the (data, points)-sharded FULL train step must
    match the unsharded step to XLA reduction-order tolerance — same PRNG
    keys draw the same global triplet set on every device."""
    from hpcs_tpu.parallel import (
        make_mesh_2d,
        make_point_sharded_train_step,
        shard_points_batch,
    )

    system, state, batch, _ = _system()
    temp = jnp.float32(0.1)

    from hpcs_tpu.ops.knn import force_xla_knn

    with force_xla_knn():  # both sides on the XLA kNN for bit-compatibility
        ref_state, ref_logs = jax.jit(system.train_step)(state, batch, KEY, temp)
        jax.block_until_ready(ref_state.params)

        for shape in ((1, 8), (2, 4)):
            mesh = make_mesh_2d(*shape)
            step = make_point_sharded_train_step(system, mesh)
            sb = shard_points_batch(mesh, batch)
            new_state, logs = step(state, sb, KEY, temp)
            np.testing.assert_allclose(
                float(logs["total_loss"]), float(ref_logs["total_loss"]),
                rtol=2e-5, err_msg=f"loss diverged on mesh {shape}")
            ref_leaves = dict(jax.tree_util.tree_leaves_with_path(ref_state.params))
            for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
                np.testing.assert_allclose(
                    np.asarray(leaf), np.asarray(ref_leaves[path]),
                    atol=5e-5, rtol=5e-4,
                    err_msg=f"params diverged at {jax.tree_util.keystr(path)} "
                            f"on mesh {shape}")
