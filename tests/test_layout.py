"""Cross-layout parity: the lane-major "vc" layout must reproduce the
channel-major "cv" layout bit-for-bit in math (same params, same outputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.nn.backbones.vn_dgcnn import VNDGCNNPartSeg
from hpcs_tpu.nn.vn.layers import (
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
    invariant_project,
)

KEY = jax.random.PRNGKey(0)


def _rand_rotation(key):
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    x, y, z, w = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_vn_llr_layouts_match():
    x_cv = jax.random.normal(KEY, (2, 16, 5, 7, 3))  # [B, N, K, C, 3]
    x_vc = jnp.swapaxes(x_cv, -1, -2)
    m_cv = VNLinearLeakyReLU(11, layout="cv")
    m_vc = VNLinearLeakyReLU(11, layout="vc")
    params = m_cv.init(KEY, x_cv, train=False)
    out_cv = m_cv.apply(params, x_cv, train=False)
    out_vc = m_vc.apply(params, x_vc, train=False)
    np.testing.assert_allclose(np.asarray(out_cv),
                               np.asarray(jnp.swapaxes(out_vc, -1, -2)),
                               rtol=1e-6, atol=1e-6)


def test_vn_maxpool_layouts_match():
    x_cv = jax.random.normal(KEY, (2, 16, 5, 7, 3))
    x_vc = jnp.swapaxes(x_cv, -1, -2)
    m_cv = VNMaxPool(layout="cv")
    m_vc = VNMaxPool(layout="vc")
    params = m_cv.init(KEY, x_cv)
    out_cv = m_cv.apply(params, x_cv)
    out_vc = m_vc.apply(params, x_vc)
    np.testing.assert_allclose(np.asarray(out_cv),
                               np.asarray(jnp.swapaxes(out_vc, -1, -2)),
                               rtol=1e-6, atol=1e-6)


def test_vn_std_feature_layouts_match():
    x_cv = jax.random.normal(KEY, (2, 16, 8, 3))
    x_vc = jnp.swapaxes(x_cv, -1, -2)
    m_cv = VNStdFeature(layout="cv")
    m_vc = VNStdFeature(layout="vc")
    params = m_cv.init(KEY, x_cv, train=False)
    std_cv, z0_cv = m_cv.apply(params, x_cv, train=False)
    std_vc, z0_vc = m_vc.apply(params, x_vc, train=False)
    # both layouts emit channel-major invariants and row-form frames
    np.testing.assert_allclose(np.asarray(std_cv), np.asarray(std_vc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z0_cv), np.asarray(z0_vc),
                               rtol=1e-5, atol=1e-6)
    inv_cv = invariant_project(x_cv, z0_cv, layout="cv")
    inv_vc = invariant_project(x_vc, z0_vc, layout="vc")
    np.testing.assert_allclose(np.asarray(inv_cv), np.asarray(inv_vc),
                               rtol=1e-5, atol=1e-6)


def _backbone_pair(pooling="mean"):
    kw = dict(out_features=8, k=6, dropout=0.0, pooling=pooling, num_categories=2)
    return (VNDGCNNPartSeg(layout="cv", **kw), VNDGCNNPartSeg(layout="vc", **kw))


@pytest.mark.parametrize("pooling", ["mean", "max"])
def test_backbone_layouts_match(pooling):
    b_cv, b_vc = _backbone_pair(pooling)
    pts = jax.random.normal(KEY, (2, 32, 3))
    label = jax.nn.one_hot(jnp.array([0, 1]), 2)
    params = b_cv.init(KEY, pts, label, train=False)
    out_cv = b_cv.apply(params, pts, label, train=False)
    out_vc = b_vc.apply(params, pts, label, train=False)
    np.testing.assert_allclose(np.asarray(out_cv), np.asarray(out_vc),
                               rtol=2e-4, atol=2e-5)


def test_backbone_vc_param_tree_identical():
    b_cv, b_vc = _backbone_pair()
    pts = jax.random.normal(KEY, (2, 32, 3))
    label = jax.nn.one_hot(jnp.array([0, 1]), 2)
    p_cv = b_cv.init(KEY, pts, label, train=False)
    p_vc = b_vc.init(KEY, pts, label, train=False)
    flat_cv = jax.tree_util.tree_map(jnp.shape, p_cv)
    flat_vc = jax.tree_util.tree_map(jnp.shape, p_vc)
    assert flat_cv == flat_vc


def test_backbone_vc_so3_invariant_output():
    """The per-point embedding must be rotation-invariant in the vc layout
    (the reference's sole correctness property, test_rotation_invariance.py)."""
    _, b_vc = _backbone_pair()
    pts = jax.random.normal(KEY, (1, 48, 3))
    label = jax.nn.one_hot(jnp.array([0]), 2)
    params = b_vc.init(KEY, pts, label, train=False)
    out = b_vc.apply(params, pts, label, train=False)
    R = _rand_rotation(jax.random.PRNGKey(7))
    out_rot = b_vc.apply(params, pts @ R.T, label, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rot),
                               rtol=1e-3, atol=1e-4)


def test_vn_llr_vc_equivariant():
    x = jax.random.normal(KEY, (2, 16, 5, 3, 7))  # vc: [..., 3, C]
    m = VNLinearLeakyReLU(9, layout="vc")
    params = m.init(KEY, x, train=False)
    R = _rand_rotation(jax.random.PRNGKey(3))
    out = m.apply(params, x, train=False)
    x_rot = jnp.einsum("ij,...jc->...ic", R, x)
    out_rot = m.apply(params, x_rot, train=False)
    np.testing.assert_allclose(np.asarray(jnp.einsum("ij,...jc->...ic", R, out)),
                               np.asarray(out_rot), rtol=1e-4, atol=1e-5)
