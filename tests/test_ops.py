"""Tests for kNN graph construction and EdgeConv features."""
import jax
import jax.numpy as jnp
import numpy as np

from hpcs_tpu.geometry import rot_3d
from hpcs_tpu.ops import (
    gather_neighbors,
    graph_feature_cross_vn,
    graph_feature_scalar,
    graph_feature_vn,
    knn,
    pairwise_neg_sqdist,
)

KEY = jax.random.PRNGKey(7)


def test_knn_matches_bruteforce():
    x = jax.random.normal(KEY, (2, 64, 3))
    idx = np.asarray(knn(x, 8))
    xn = np.asarray(x)
    for b in range(2):
        d = ((xn[b][:, None, :] - xn[b][None, :, :]) ** 2).sum(-1)
        want = np.argsort(d, axis=-1, kind="stable")[:, :8]
        # compare distance sets (ties may reorder indices)
        got_d = np.take_along_axis(d, idx[b], axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1), atol=1e-5)


def test_knn_self_first():
    x = jax.random.normal(KEY, (1, 32, 3))
    idx = np.asarray(knn(x, 4))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(32))


def test_knn_graph_rotation_invariant():
    x = jax.random.normal(KEY, (2, 64, 3))
    angles = jax.random.uniform(jax.random.fold_in(KEY, 1), (3,)) * 2 * jnp.pi
    R = rot_3d(angles[0], angles[1], angles[2])
    idx0 = np.asarray(knn(x, 8))
    idx1 = np.asarray(knn(x @ R.T, 8))
    # distances are rotation-invariant up to fp error; >99% of neighbor sets match
    same = (np.sort(idx0, -1) == np.sort(idx1, -1)).all(-1).mean()
    assert same > 0.95


def test_pairwise_neg_sqdist_values():
    x = jax.random.normal(KEY, (1, 16, 5))
    got = np.asarray(pairwise_neg_sqdist(x))[0]
    xn = np.asarray(x)[0]
    want = -((xn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gather_neighbors():
    x = jax.random.normal(KEY, (2, 16, 4, 3))
    idx = jax.random.randint(jax.random.fold_in(KEY, 2), (2, 16, 5), 0, 16)
    out = np.asarray(gather_neighbors(x, idx))
    xn, idxn = np.asarray(x), np.asarray(idx)
    for b in range(2):
        for n in range(16):
            for kk in range(5):
                np.testing.assert_array_equal(out[b, n, kk], xn[b, idxn[b, n, kk]])


def test_graph_feature_vn_structure():
    x = jax.random.normal(KEY, (2, 32, 4, 3))
    feat, idx = graph_feature_vn(x, k=6)
    assert feat.shape == (2, 32, 6, 8, 3)
    # second half of channels is the broadcast center point
    np.testing.assert_allclose(
        np.asarray(feat[:, :, :, 4:, :]),
        np.asarray(jnp.broadcast_to(x[:, :, None], (2, 32, 6, 4, 3))),
        atol=0,
    )
    # first half is neighbor - center
    nb = gather_neighbors(x, idx)
    np.testing.assert_allclose(
        np.asarray(feat[:, :, :, :4, :]), np.asarray(nb - x[:, :, None]), atol=0
    )


def test_graph_feature_vn_equivariant():
    x = jax.random.normal(KEY, (2, 32, 1, 3))
    angles = jax.random.uniform(jax.random.fold_in(KEY, 3), (3,)) * 2 * jnp.pi
    R = rot_3d(angles[0], angles[1], angles[2])
    feat0, idx0 = graph_feature_vn(x, k=6)
    feat1, idx1 = graph_feature_vn(jnp.einsum("...v,wv->...w", x, R), k=6, idx=idx0)
    np.testing.assert_allclose(
        np.asarray(feat1), np.asarray(jnp.einsum("...v,wv->...w", feat0, R)),
        atol=1e-5, rtol=1e-4,
    )


def test_graph_feature_cross_vn():
    x = jax.random.normal(KEY, (1, 16, 2, 3))
    feat, idx = graph_feature_cross_vn(x, k=4)
    assert feat.shape == (1, 16, 4, 6, 3)
    nb = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[:, :, None], nb.shape)
    np.testing.assert_allclose(
        np.asarray(feat[..., 4:6, :]), np.asarray(jnp.cross(nb, center)), atol=1e-6
    )


def test_graph_feature_scalar():
    x = jax.random.normal(KEY, (2, 16, 5))
    feat, idx = graph_feature_scalar(x, k=4)
    assert feat.shape == (2, 16, 4, 10)
    nb = gather_neighbors(x, idx)
    np.testing.assert_allclose(np.asarray(feat[..., :5]), np.asarray(nb - x[:, :, None]), atol=0)


def test_gather_neighbors_onehot_matches_index(monkeypatch):
    """MXU one-hot selection == indexed gather, bit-exact, both dtypes."""
    import jax

    from hpcs_tpu.ops.knn import gather_neighbors

    key = jax.random.PRNGKey(5)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(key, (2, 64, 7, 3), dt)
        idx = jax.random.randint(key, (2, 64, 9), 0, 64)
        monkeypatch.setenv("HPCS_TPU_GATHER", "index")
        ref = gather_neighbors(x, idx)
        monkeypatch.setenv("HPCS_TPU_GATHER", "onehot")
        got = gather_neighbors(x, idx)
        assert got.shape == ref.shape == (2, 64, 9, 7, 3)
        assert bool(jnp.all(got == ref)), str(dt)
