"""Tests for the non-flagship backbones: DGCNN, PointNet, VN-PointNet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.geometry import rot_3d
from hpcs_tpu.nn.backbones.dgcnn import DGCNNPartSeg, TransformNet
from hpcs_tpu.nn.backbones.pointnet import PointNetPartSeg, STNkd
from hpcs_tpu.nn.backbones.vn_pointnet import VNPointNetPartSeg

KEY = jax.random.PRNGKey(23)


def _run(model, B=2, N=64, num_categories=16, out_last=None):
    pts = jax.random.normal(KEY, (B, N, 3))
    label = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), num_categories)
    variables = model.init({"params": KEY}, pts, label, train=False)
    out = model.apply(variables, pts, label, train=False)
    assert jnp.all(jnp.isfinite(out))
    return out, variables, pts, label


def test_dgcnn_shape_and_head_channels():
    model = DGCNNPartSeg(out_features=50, k=8)
    out, variables, _, _ = _run(model)
    assert out.shape == (2, 64, 50)
    assert variables["params"]["conv8"]["Dense_0"]["kernel"].shape[0] == 1280


def test_transform_net_identity_init():
    tn = TransformNet()
    e = jax.random.normal(KEY, (2, 16, 4, 6))
    v = tn.init(KEY, e, train=False)
    t = tn.apply(v, e, train=False)
    # transform head is zero-weight + identity-bias at init
    np.testing.assert_allclose(np.asarray(t), np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-5)


def test_pointnet_shape_and_logprobs():
    model = PointNetPartSeg(num_part=50)
    out, variables, _, _ = _run(model)
    assert out.shape == (2, 64, 50)
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, atol=1e-4)
    assert variables["params"]["convs1"]["Dense_0"]["kernel"].shape[0] == 4944


def test_pointnet_stn_identity_at_init_mean():
    stn = STNkd(k=3)
    x = jax.random.normal(KEY, (2, 32, 3))
    v = stn.init(KEY, x, train=False)
    t = stn.apply(v, x, train=False)
    assert t.shape == (2, 3, 3)


def test_vn_pointnet_shape_and_head_channels():
    model = VNPointNetPartSeg(num_part=50, k=8)
    out, variables, _, _ = _run(model)
    assert out.shape == (2, 64, 50)
    assert variables["params"]["convs1"]["Dense_0"]["kernel"].shape[0] == 9025


def test_vn_pointnet_so3_invariance():
    model = VNPointNetPartSeg(num_part=20, k=8)
    pts = jax.random.normal(KEY, (2, 64, 3))
    label = jax.nn.one_hot(jnp.zeros((2,), jnp.int32), 16)
    variables = model.init({"params": KEY}, pts, label, train=False)
    angles = jax.random.uniform(jax.random.fold_in(KEY, 1), (3,)) * 2 * jnp.pi
    R = rot_3d(angles[0], angles[1], angles[2])
    out0 = model.apply(variables, pts, label, train=False)
    out1 = model.apply(variables, pts @ R.T, label, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=5e-4, rtol=1e-2)


@pytest.mark.parametrize("model_name", ["dgcnn_partseg", "pointnet_partseg",
                                        "vn_pointnet_partseg"])
def test_system_with_alt_backbones(model_name):
    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(
        dataset="shapenet", model_name=model_name, num_class=6, num_categories=2,
        fixed_points=64, eucl_dim=6, hyp_dim=4, k=8, t_per_anchor=5,
        num_triplets=512, temperature=0.1,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=4, npoints=64, num_categories=2,
                              parts_per_object=3)
    batch = next(iter(DataLoader(ds, 2)))
    state = system.init(KEY, batch)
    state, logs = system.train_step(state, batch, KEY, jnp.float32(0.1))
    assert np.isfinite(float(logs["total_loss"]))
