"""Tests for the fixed-shape balanced triplet miner."""
import jax
import jax.numpy as jnp
import numpy as np

from hpcs_tpu.miner import (
    cosine_similarity01,
    margin_filter,
    pairwise_cosine_similarity01,
    sample_balanced_triplets,
    sample_random_triplets,
)

KEY = jax.random.PRNGKey(11)


def _labels(counts):
    return jnp.concatenate([jnp.full((c,), i, jnp.int32) for i, c in enumerate(counts)])


def test_triplet_validity_laws():
    labels = _labels([10, 20, 5])
    trip = sample_balanced_triplets(KEY, labels, 3, t_per_anchor=20)
    a, p, n, mask = map(np.asarray, trip)
    lab = np.asarray(labels)
    valid = mask > 0
    assert valid.all()  # every label has >= 2 members and negatives exist
    # positives share the anchor label and are distinct elements
    assert (lab[a[valid]] == lab[p[valid]]).all()
    assert (a[valid] != p[valid]).all()
    # negatives have a different label
    assert (lab[a[valid]] != lab[n[valid]]).all()


def test_triplet_singleton_label_masked():
    labels = _labels([1, 8])
    trip = sample_balanced_triplets(KEY, labels, 2, t_per_anchor=30)
    a, p, n, mask = map(np.asarray, trip)
    lab = np.asarray(labels)
    # anchors from the singleton label cannot appear among valid triplets
    assert (lab[a[mask > 0]] == 1).all()
    assert (a[mask > 0] != p[mask > 0]).all()


def test_triplet_single_class_all_masked():
    labels = _labels([16])
    trip = sample_balanced_triplets(KEY, labels, 1, t_per_anchor=10)
    assert np.asarray(trip.mask).sum() == 0


def test_balanced_sampling_upweights_rare_classes():
    # fraction=1 -> anchors per element of label l ~ max/n_l, so each *label*
    # is expected to contribute ~equally overall
    labels = _labels([100, 10])
    trip = sample_balanced_triplets(
        jax.random.PRNGKey(0), labels, 2, t_per_anchor=50, fraction=1.0
    )
    a = np.asarray(trip.anchor)
    lab = np.asarray(labels)
    frac_rare = (lab[a] == 1).mean()
    assert 0.4 < frac_rare < 0.6


def test_positive_sampling_uniform():
    labels = _labels([4, 4])
    trip = sample_balanced_triplets(
        jax.random.PRNGKey(1), labels, 2, t_per_anchor=4000
    )
    a, p = np.asarray(trip.anchor), np.asarray(trip.positive)
    # for anchor 0, positives must be uniform over {1, 2, 3}
    sel = p[a == 0]
    counts = np.bincount(sel, minlength=8)[1:4]
    assert counts.min() > 0.8 * counts.mean()


def test_margin_filter_easy():
    emb = jnp.array([[1.0, 0], [1.0, 0.01], [-1.0, 0], [0.0, 1.0]])
    labels = jnp.array([0, 0, 1, 1])
    trip = sample_balanced_triplets(KEY, labels, 2, t_per_anchor=50)
    filtered = margin_filter(emb, trip, margin=0.0, type_of_triplets="easy")
    a, p, n, mask = map(np.asarray, filtered)
    ap = np.asarray(cosine_similarity01(emb[a], emb[p]))
    an = np.asarray(cosine_similarity01(emb[a], emb[n]))
    assert ((ap - an)[mask > 0] > 0).all()
    # masked-out entries are exactly the non-easy ones (of the valid set)
    base_mask = np.asarray(trip.mask)
    assert ((ap - an)[(mask == 0) & (base_mask > 0)] <= 0).all()


def test_sample_random_triplets_distinct():
    trip = sample_random_triplets(KEY, 32, t_per_anchor=10)
    a, p, n, mask = map(np.asarray, trip)
    assert (a != p).all()
    v = mask > 0
    assert (n[v] != a[v]).all() and (n[v] != p[v]).all()


def test_pairwise_cosine_matches_elementwise():
    x = jax.random.normal(KEY, (16, 4))
    mat = np.asarray(pairwise_cosine_similarity01(x))
    for i in range(16):
        for j in range(16):
            want = np.asarray(cosine_similarity01(x[i], x[j]))
            np.testing.assert_allclose(mat[i, j], want, atol=1e-5)
