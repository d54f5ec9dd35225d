"""Tests for CosFace, hierarchical CosFace, and the HypHC joint loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.loss import (
    LossConfig,
    anneal_temperature,
    compute_losses,
    cosface_init,
    cosface_logits,
    cosface_loss,
    get_logits,
    hierarchical_cosface_loss,
    hierarchy_sum_matrices,
    hyphc_triplet_loss,
    mean_pairwise_similarity,
    normalize_to_radius,
    triplet_margin_loss,
)
from hpcs_tpu.miner import (
    Triplets,
    pairwise_cosine_similarity01,
    sample_balanced_triplets,
)

KEY = jax.random.PRNGKey(5)


def test_cosface_logits_margin_applied_to_target_only():
    W = cosface_init(KEY, 4, 3)
    emb = jax.random.normal(jax.random.fold_in(KEY, 1), (8, 4))
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    base = cosface_logits(W, emb, labels, margin=0.0, scale=2.0)
    with_m = cosface_logits(W, emb, labels, margin=0.35, scale=2.0)
    diff = np.asarray(base - with_m)
    onehot = np.eye(3)[np.asarray(labels)]
    np.testing.assert_allclose(diff, 2.0 * 0.35 * onehot, atol=1e-5)


def test_cosface_loss_decreases_for_aligned_embeddings():
    W = cosface_init(KEY, 4, 3)
    labels = jnp.array([0, 1, 2] * 4)
    # embeddings aligned with their class weight column -> lower loss
    Wn = W / jnp.linalg.norm(W, axis=0, keepdims=True)
    aligned = Wn.T[labels]
    random = jax.random.normal(jax.random.fold_in(KEY, 2), aligned.shape)
    assert cosface_loss(W, aligned, labels) < cosface_loss(W, random, labels)


def test_cosface_perfect_separation_low_loss():
    # strong scale, aligned embeddings: loss ~ CE of near-one-hot softmax
    W = jnp.eye(3)
    labels = jnp.array([0, 1, 2])
    emb = jnp.eye(3) * 10
    loss = cosface_loss(W, emb, labels, margin=0.0, scale=30.0)
    assert loss < 1e-8


def test_hierarchy_sum_matrices():
    # 4 classes, one level: branches {0,1} and {2,3}
    mats = hierarchy_sum_matrices([[[0, 1], [2, 3]]], 4)
    S = np.asarray(mats[0])
    probs = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    summed = np.asarray(probs @ S)
    np.testing.assert_allclose(summed, [[0.3, 0.3, 0.7, 0.7]], atol=1e-6)


def test_hierarchy_sum_matrices_partial_coverage():
    # class 3 not in any branch keeps its own probability
    mats = hierarchy_sum_matrices([[[0, 1]]], 4)
    probs = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    summed = np.asarray(probs @ mats[0])
    np.testing.assert_allclose(summed, [[0.3, 0.3, 0.3, 0.4]], atol=1e-6)


def test_hierarchical_cosface_reduces_to_plain_nll_of_branch():
    W = cosface_init(KEY, 8, 4)
    emb = jax.random.normal(jax.random.fold_in(KEY, 3), (16, 8))
    labels = jnp.array([0, 1, 2, 3] * 4)
    mats = hierarchy_sum_matrices([[[0], [1], [2], [3]]], 4)  # leaf level
    got = hierarchical_cosface_loss(W, emb, labels, mats)
    want = cosface_loss(W, emb, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_mean_pairwise_similarity_closed_form():
    x = jax.random.normal(KEY, (64, 6))
    got = mean_pairwise_similarity(x)
    want = np.asarray(pairwise_cosine_similarity01(x)).mean()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_normalize_to_radius():
    x = jax.random.normal(KEY, (32, 4))
    y = normalize_to_radius(x, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(y, axis=-1)), 0.5, atol=1e-5)
    # scale clamped to [1e-4, 1]
    y2 = normalize_to_radius(x, jnp.float32(5.0))
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(y2, axis=-1)), 1.0, atol=1e-5)


def test_hyphc_loss_prefers_correct_hierarchy():
    """Embeddings whose LCA geometry matches similarity structure must score
    lower than adversarially mismatched ones."""
    # two tight clusters far apart on the ball
    k1, k2 = jax.random.split(KEY)
    a = jnp.array([0.6, 0.0]) + 0.01 * jax.random.normal(k1, (8, 2))
    b = jnp.array([-0.6, 0.0]) + 0.01 * jax.random.normal(k2, (8, 2))
    x_good = jnp.concatenate([a, b])
    labels = jnp.concatenate([jnp.zeros(8, jnp.int32), jnp.ones(8, jnp.int32)])
    trip = sample_balanced_triplets(KEY, labels, 2, t_per_anchor=100)
    scale = jnp.float32(0.6)
    loss_good = hyphc_triplet_loss(x_good, trip, scale, 0.05)
    # shuffled labels -> mismatched triplets
    perm = jax.random.permutation(jax.random.fold_in(KEY, 9), 16)
    trip_bad = Triplets(perm[trip.anchor % 16], perm[trip.positive % 16],
                        perm[trip.negative % 16], trip.mask)
    loss_bad = hyphc_triplet_loss(x_good, trip_bad, scale, 0.05)
    assert float(loss_good) < float(loss_bad)


def test_triplet_margin_loss_zero_when_separated():
    emb = jnp.array([[1.0, 0.0], [0.99, 0.01], [-1.0, 0.0], [-0.99, -0.01]])
    trip = Triplets(
        jnp.array([0, 2]), jnp.array([1, 3]), jnp.array([2, 0]),
        jnp.ones((2,), jnp.float32),
    )
    loss = triplet_margin_loss(emb, trip, margin=0.05)
    assert float(loss) == 0.0


def test_compute_losses_all_configs_finite_and_jittable():
    M, D, L = 64, 4, 5
    x = jax.random.normal(KEY, (M, D)) * 0.1
    labels = jax.random.randint(jax.random.fold_in(KEY, 1), (M,), 0, L)
    W = cosface_init(KEY, D, L)
    mats = hierarchy_sum_matrices([[[0, 1], [2, 3, 4]]], L)
    for cosface, miner, hier in [
        (True, True, False), (True, False, False), (False, True, False),
        (True, True, True),
    ]:
        cfg = LossConfig(num_class=L, embedding_size=D, cosface=cosface,
                         miner=miner, hierarchical=hier, num_triplets=512)

        def f(key, x):
            return compute_losses(
                key, cfg, x, labels, jnp.float32(1e-3), 0.05,
                hierarchy_matrices=mats if hier else None, cosface_W=W,
            )

        out = jax.jit(f)(KEY, x)
        assert jnp.isfinite(out["loss_hyp"]), (cosface, miner, hier)
        assert jnp.isfinite(out["loss_metric"]), (cosface, miner, hier)


def test_compute_losses_grads_finite():
    M, D, L = 32, 3, 4
    x = jax.random.normal(KEY, (M, D)) * 0.1
    labels = jax.random.randint(jax.random.fold_in(KEY, 2), (M,), 0, L)
    W = cosface_init(KEY, D, L)
    cfg = LossConfig(num_class=L, embedding_size=D, num_triplets=256)

    def total(x, W, scale):
        out = compute_losses(KEY, cfg, x, labels, scale, 0.05, cosface_W=W)
        return out["loss_hyp"] * 0.1 + out["loss_metric"]

    gx, gW, gs = jax.grad(total, argnums=(0, 1, 2))(x, W, jnp.float32(1e-3))
    assert np.all(np.isfinite(gx)) and np.all(np.isfinite(gW)) and np.isfinite(gs)
    assert np.abs(gx).max() > 0


def test_get_logits_matches_cosface_logits():
    W = cosface_init(KEY, 4, 3)
    emb = jax.random.normal(KEY, (8, 4))
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    cfg = LossConfig(num_class=3, embedding_size=4)
    np.testing.assert_allclose(
        np.asarray(get_logits(cfg, W, emb, labels)),
        np.asarray(cosface_logits(W, emb, labels, 0.35, 2.0)),
        atol=0,
    )


def test_anneal_temperature():
    assert anneal_temperature(1.0, 0.5) == 0.5
    assert anneal_temperature(1.0, 0.05) == pytest.approx(0.2)  # clamped low
    assert anneal_temperature(1.0, 2.0) == 1.0  # clamped high
