"""On-device linkage/decode vs the scipy golden oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.decode import (
    adjusted_rand_index,
    cut_maxclust,
    eval_clustering,
    get_optimal_k,
    linkage,
    purity,
    remap_consecutive,
)
from hpcs_tpu.decode.host import (
    cut_maxclust_host,
    get_optimal_k_host,
    linkage_host,
    purity_host,
)

KEY = jax.random.PRNGKey(21)


def _clustered_points(key, n_clusters=4, per=16, d=3, spread=0.05):
    keys = jax.random.split(key, n_clusters)
    centers = jax.random.normal(key, (n_clusters, d)) * 2.0
    pts = jnp.concatenate(
        [centers[i] + spread * jax.random.normal(keys[i], (per, d)) for i in range(n_clusters)]
    )
    labels = jnp.repeat(jnp.arange(n_clusters), per)
    return pts, labels


@pytest.mark.parametrize("method", ["complete", "single", "average"])
def test_linkage_matches_scipy_distances(method):
    x, _ = _clustered_points(KEY)
    Z = np.asarray(linkage(x, method=method, metric="cosine"))
    Zs = linkage_host(np.asarray(x), method=method, metric="cosine")
    # merge heights must match (sorted, since tie order may differ)
    np.testing.assert_allclose(np.sort(Z[:, 2]), np.sort(Zs[:, 2]), atol=1e-4)
    # sizes of merges must match as multisets
    np.testing.assert_array_equal(np.sort(Z[:, 3]), np.sort(Zs[:, 3]))


def _both_linkages_same_distances(x, method):
    """(ours, scipy) linkage fed the SAME fp32 distance matrix.  Tight fp32
    clusters contain exactly-zero cosine distances that scipy's float64
    metric computation would not produce (and jit fusion can shift distance
    bits vs an eager call), so both sides must consume one shared matrix to
    compare the agglomeration itself."""
    from scipy.cluster.hierarchy import linkage as scipy_linkage
    from scipy.spatial.distance import squareform

    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    D = np.asarray(cosine_distance_matrix(x), np.float32)
    D = np.float32(0.5) * (D + D.T)
    ours = np.asarray(linkage_from_distances_mnn(jnp.asarray(D), method=method))
    D64 = D.astype(np.float64)
    np.fill_diagonal(D64, 0.0)
    ref = scipy_linkage(squareform(D64, checks=False), method=method)
    return ours, ref


@pytest.mark.parametrize("method", ["complete", "single"])
def test_linkage_matches_scipy_large_n(method):
    """N=600 exercises multiple compaction stages of the MNN cascade
    (600 -> 300 -> ...), including the K-capped merge bookkeeping and the
    compaction transitions — the small-N tests never leave stage one."""
    # spread 0.3: tight clusters collapse many fp32 cosine distances to
    # exactly 0, making merge order (and thus size multisets) tie-ambiguous
    x, _ = _clustered_points(jax.random.fold_in(KEY, 77), n_clusters=12,
                             per=50, d=8, spread=0.3)
    Z, Zs = _both_linkages_same_distances(x, method)
    np.testing.assert_allclose(np.sort(Z[:, 2]), np.sort(Zs[:, 2]), atol=2e-6)
    np.testing.assert_array_equal(np.sort(Z[:, 3]), np.sort(Zs[:, 3]))
    # flat cuts agree as partitions at every k the decode sweep uses
    from sklearn.metrics.cluster import adjusted_rand_score

    for k in (2, 5, 12):
        got = np.asarray(cut_maxclust(Z, jnp.int32(k)))
        want = cut_maxclust_host(Zs, k)
        assert adjusted_rand_score(got, want) == pytest.approx(1.0), (method, k)


@pytest.mark.slow
def test_linkage_matches_scipy_n1200_multi_stage():
    """N=1200 runs several consecutive compaction stages, so the
    compact-then-continue transitions at realistic decode sizes are
    covered too (1024-point clouds decode through this path)."""
    x, _ = _clustered_points(jax.random.fold_in(KEY, 78), n_clusters=30,
                             per=40, d=8, spread=0.3)
    Z, Zs = _both_linkages_same_distances(x, "complete")
    np.testing.assert_allclose(np.sort(Z[:, 2]), np.sort(Zs[:, 2]), atol=2e-6)
    np.testing.assert_array_equal(np.sort(Z[:, 3]), np.sort(Zs[:, 3]))


@pytest.mark.parametrize("k", [1, 2, 3, 4, 6])
def test_cut_maxclust_matches_scipy(k):
    from sklearn.metrics.cluster import adjusted_rand_score

    x, _ = _clustered_points(KEY, n_clusters=4, per=12)
    Z = linkage(x, method="complete", metric="cosine")
    got = np.asarray(cut_maxclust(Z, jnp.int32(k)))
    Zs = linkage_host(np.asarray(x), method="complete", metric="cosine")
    want = cut_maxclust_host(Zs, k)
    # same partition up to label permutation
    assert adjusted_rand_score(got, want) == pytest.approx(1.0)
    assert len(np.unique(got)) == len(np.unique(want))


def test_cut_maxclust_k1_and_kn():
    x, _ = _clustered_points(KEY, n_clusters=2, per=8)
    Z = linkage(x)
    l1 = np.asarray(cut_maxclust(Z, jnp.int32(1)))
    assert (l1 == 0).all()
    ln = np.asarray(cut_maxclust(Z, jnp.int32(16)))
    assert len(np.unique(ln)) == 16


def test_remap_consecutive():
    y = jnp.array([5, 3, 5, 9, 3])
    r, n = remap_consecutive(y, 16)
    np.testing.assert_array_equal(np.asarray(r), [1, 0, 1, 2, 0])
    assert int(n) == 3


def test_adjusted_rand_matches_sklearn():
    from sklearn.metrics.cluster import adjusted_rand_score

    rng = np.random.RandomState(0)
    for _ in range(5):
        yt = rng.randint(0, 5, 64)
        yp = rng.randint(0, 7, 64)
        got = float(adjusted_rand_index(jnp.asarray(yt), jnp.asarray(yp), 5, 7))
        want = adjusted_rand_score(yt, yp)
        assert got == pytest.approx(want, abs=1e-4)


def test_purity_matches_host():
    rng = np.random.RandomState(1)
    yt = rng.randint(0, 4, 100)
    yp = rng.randint(0, 6, 100)
    got = float(purity(jnp.asarray(yt), jnp.asarray(yp), 4, 6))
    want = purity_host(yt, yp)
    assert got == pytest.approx(want, abs=1e-6)


def test_get_optimal_k_matches_reference_oracle():
    x, labels = _clustered_points(KEY, n_clusters=4, per=16)
    Z = linkage(x, method="complete", metric="cosine")
    pred, k, score = get_optimal_k(labels, Z, num_class=8, index="iou")
    Zs = linkage_host(np.asarray(x), method="complete", metric="cosine")
    _, k_host, score_host = get_optimal_k_host(np.asarray(labels), Zs, index="iou")
    assert float(score) == pytest.approx(score_host, abs=1e-3)
    assert int(k) == k_host


def test_get_optimal_k_perfect_clusters_score_one():
    x, labels = _clustered_points(jax.random.fold_in(KEY, 2), n_clusters=3, per=20,
                                  spread=0.01)
    Z = linkage(x, method="complete", metric="euclidean")
    pred, k, score = get_optimal_k(labels, Z, num_class=6, index="iou")
    assert float(score) == pytest.approx(1.0, abs=1e-5)
    assert int(k) == 3


def test_get_optimal_k_ri_index():
    x, labels = _clustered_points(jax.random.fold_in(KEY, 3), n_clusters=3, per=10,
                                  spread=0.02)
    Z = linkage(x, method="complete", metric="euclidean")
    _, k, score = get_optimal_k(labels, Z, num_class=6, index="ri")
    assert float(score) == pytest.approx(1.0, abs=1e-5)


def test_eval_clustering():
    x, labels = _clustered_points(jax.random.fold_in(KEY, 4), n_clusters=4, per=12,
                                  spread=0.01)
    Z = linkage(x, method="complete", metric="euclidean")
    ri, wiou, pu = eval_clustering(labels, Z, num_class=8)
    assert float(ri) == pytest.approx(1.0, abs=1e-5)
    assert float(pu) == pytest.approx(1.0, abs=1e-6)
    assert 0.0 <= float(wiou) <= 1.0


def test_weighted_jaccard_matches_sklearn():
    """weighted_jaccard (the reference's second eval_clustering metric,
    scores.py:239) pinned against sklearn jaccard_score(average='weighted')
    on the same remapped ids."""
    from sklearn.metrics import jaccard_score

    from hpcs_tpu.decode.scores import weighted_jaccard

    rng = np.random.default_rng(11)
    for _ in range(5):
        y_true = rng.integers(0, 5, size=60)
        y_pred = rng.integers(0, 7, size=60)
        ours = float(weighted_jaccard(jnp.asarray(y_true), jnp.asarray(y_pred),
                                      c_max=5, k_max=7))
        ref = jaccard_score(y_true, y_pred, average="weighted", zero_division=0)
        assert ours == pytest.approx(ref, abs=1e-6)


def _tied_and_untied_dendrograms():
    """(name, points) cases: generic positions and heavy exact ties
    (duplicated points collapse many merge heights to identical values)."""
    rng = np.random.RandomState(17)
    untied = rng.randn(30, 3)
    base = rng.randn(8, 3)
    tied = np.vstack([base, base, base])  # 3 copies of 8 points
    return [("untied", untied), ("tied", tied)]


@pytest.mark.parametrize("method", ["complete", "single", "average"])
def test_cut_maxclust_fcluster_matches_scipy_bitwise(method):
    """cut_maxclust_fcluster == scipy fcluster(maxclust) - 1 EXACTLY —
    numbering included, not just the partition — on tied and untied
    dendrograms, k = 1..C+4 and k >= N (scipy's identity special case)."""
    from scipy.cluster.hierarchy import fcluster
    from scipy.cluster.hierarchy import linkage as scipy_linkage

    from hpcs_tpu.decode import cut_maxclust_fcluster

    for name, X in _tied_and_untied_dendrograms():
        n = len(X)
        Z = scipy_linkage(X, method=method, metric="euclidean")
        Zj = jnp.asarray(Z)
        for k in list(range(1, 13)) + [n, n + 4]:
            want = fcluster(Z, k, "maxclust") - 1
            got = np.asarray(cut_maxclust_fcluster(Zj, jnp.int32(k)))
            np.testing.assert_array_equal(got, want, err_msg=f"{name} k={k}")


@pytest.mark.slow
def test_cut_maxclust_fcluster_bulk_seeded_sweep():
    """Bulk bitwise fcluster equality: 30 seeds x 3 methods x every k in
    1..N+2, with per-seed mixed tie structure (a random subset of points
    duplicated 2-3x so many merge heights collide exactly) — ~2.3k cases
    backing the coverage claim in cut_maxclust_fcluster's docstring."""
    from scipy.cluster.hierarchy import fcluster
    from scipy.cluster.hierarchy import linkage as scipy_linkage

    from hpcs_tpu.decode import cut_maxclust_fcluster

    for seed in range(30):
        rng = np.random.RandomState(1000 + seed)
        base = rng.randn(rng.randint(10, 18), 3)
        reps = rng.randint(1, 4, size=len(base))  # 1-3 copies per point
        X = np.repeat(base, reps, axis=0)
        n = len(X)
        for method in ("complete", "single", "average"):
            Z = scipy_linkage(X, method=method, metric="euclidean")
            Zj = jnp.asarray(Z)
            for k in range(1, n + 3):
                want = fcluster(Z, k, "maxclust") - 1
                got = np.asarray(cut_maxclust_fcluster(Zj, jnp.int32(k)))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"seed={seed} method={method} k={k}")


def test_weighted_jaccard_matches_reference_pipeline_bitwise():
    """End-to-end metric comparability (VERDICT r3 #9): our weighted_jaccard
    on a cut_maxclust_fcluster cut equals the reference's
    jaccard_score(average='weighted') computed on scipy fcluster output
    (np.unique-remapped, reference scores.py:229-240), for k = 1..C+4 on
    tied and untied dendrograms."""
    from scipy.cluster.hierarchy import fcluster
    from scipy.cluster.hierarchy import linkage as scipy_linkage
    from sklearn.metrics import jaccard_score

    from hpcs_tpu.decode import cut_maxclust_fcluster
    from hpcs_tpu.decode.scores import weighted_jaccard

    rng = np.random.RandomState(23)
    C = 5
    for name, X in _tied_and_untied_dendrograms():
        n = len(X)
        y = rng.randint(0, C, size=n)
        Z = scipy_linkage(X, method="complete", metric="euclidean")
        Zj = jnp.asarray(Z)
        for k in range(1, C + 5):
            f = fcluster(Z, k, "maxclust") - 1
            _, y_ref = np.unique(y, return_inverse=True)
            _, p_ref = np.unique(f, return_inverse=True)
            ref = jaccard_score(y_ref, p_ref, average="weighted",
                                zero_division=0)
            ours_pred = cut_maxclust_fcluster(Zj, jnp.int32(k))
            np.testing.assert_array_equal(np.asarray(ours_pred), f)
            m = max(C, n + 1)
            got = float(weighted_jaccard(
                jnp.asarray(y_ref), ours_pred, c_max=m, k_max=m))
            assert got == pytest.approx(ref, abs=1e-6), (name, k)


def test_eval_clustering_fcluster_ids_matches_reference():
    """eval_clustering(fcluster_ids=True) reproduces the reference's
    (rand, weighted-iou) pair computed with scipy/sklearn on the same
    dendrogram and labels."""
    from scipy.cluster.hierarchy import fcluster
    from sklearn.metrics import adjusted_rand_score, jaccard_score

    x, labels = _clustered_points(jax.random.fold_in(KEY, 9), n_clusters=4,
                                  per=12, spread=0.4)
    Z = linkage(x, method="complete", metric="cosine")
    ri, wiou, _ = eval_clustering(labels, Z, num_class=8, fcluster_ids=True)
    y = np.asarray(labels)
    f = fcluster(np.asarray(Z, np.float64), int(y.max()) + 1, "maxclust") - 1
    _, y_ref = np.unique(y, return_inverse=True)
    _, p_ref = np.unique(f, return_inverse=True)
    assert float(ri) == pytest.approx(
        adjusted_rand_score(y_ref, p_ref), abs=1e-5)
    assert float(wiou) == pytest.approx(
        jaccard_score(y_ref, p_ref, average="weighted", zero_division=0),
        abs=1e-6)


def test_decode_batch_vmap():
    xs = jnp.stack([_clustered_points(jax.random.fold_in(KEY, i))[0] for i in range(3)])
    Zs = jax.vmap(lambda x: linkage(x))(xs)
    assert Zs.shape == (3, 63, 4)
    labels = jax.vmap(lambda Z: cut_maxclust(Z, jnp.int32(4)))(Zs)
    assert labels.shape == (3, 64)


@pytest.mark.parametrize("method", ["complete", "single", "average"])
def test_mnn_linkage_matches_scipy_exactly(method):
    """The mutual-NN-rounds algorithm must reproduce scipy's dendrogram:
    identical merge heights and identical partitions at every cut (the
    NN-chain reducibility theorem guarantees this for these methods)."""
    from sklearn.metrics.cluster import adjusted_rand_score

    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    rng = np.random.RandomState(7)
    x = rng.randn(48, 4).astype(np.float32)
    Zm = np.asarray(linkage_from_distances_mnn(
        cosine_distance_matrix(jnp.asarray(x)), method=method))
    Zs = linkage_host(x, method=method, metric="cosine")
    np.testing.assert_allclose(np.sort(Zm[:, 2]), np.sort(Zs[:, 2]), atol=1e-5)
    np.testing.assert_array_equal(np.sort(Zm[:, 3]), np.sort(Zs[:, 3]))
    for k in (2, 3, 5, 8, 16):
        pm = np.asarray(cut_maxclust(jnp.asarray(Zm), jnp.int32(k)))
        ps = cut_maxclust_host(Zs, k)
        assert adjusted_rand_score(pm, ps) == pytest.approx(1.0), (method, k)


def test_mnn_linkage_sorted_and_well_formed():
    from hpcs_tpu.decode.linkage import (
        euclidean_distance_matrix,
        linkage_from_distances_mnn,
    )

    x = jax.random.normal(KEY, (32, 3))
    Z = np.asarray(linkage_from_distances_mnn(euclidean_distance_matrix(x)))
    # heights nondecreasing (monotone linkage, sorted rows)
    assert (np.diff(Z[:, 2]) >= -1e-6).all()
    # every merged-cluster id referenced after it is created
    for r in range(Z.shape[0]):
        for col in (0, 1):
            cid = int(Z[r, col])
            if cid >= 32:
                assert cid - 32 < r, f"row {r} references future cluster {cid}"
    # final size = N
    assert Z[-1, 3] == 32


def test_cut_maxclust_many_matches_per_k():
    """Shared-table sweep == stacked per-k cuts (exact labels)."""
    from hpcs_tpu.decode.linkage import cut_maxclust_many

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(97, 8).astype(np.float32))
    Z = linkage(x, method="complete", metric="cosine")
    ks = jnp.arange(1, 21)
    many = np.asarray(cut_maxclust_many(Z, ks))
    for i, k in enumerate(np.asarray(ks)):
        one = np.asarray(cut_maxclust(Z, int(k)))
        np.testing.assert_array_equal(many[i], one)


def test_cut_roots_sweep_partitions_match_cuts():
    """Scan-based sweep labels induce the same partitions as cut_maxclust,
    and the bounded labels stay < 2*k_hi (contingency-table bound)."""
    from hpcs_tpu.decode.linkage import build_cut_tables, cut_roots_sweep

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(64, 6).astype(np.float32))
    Z = linkage(x, method="complete", metric="cosine")
    child_row, up, is_b = build_cut_tables(Z)
    k_hi = 12
    roots, labels, ks = cut_roots_sweep(Z, child_row, up, is_b, k_hi)
    roots, labels, ks = np.asarray(roots), np.asarray(labels), np.asarray(ks)
    assert labels.min() >= 0 and labels.max() < 2 * k_hi
    for i, k in enumerate(ks):
        want = np.asarray(cut_maxclust(Z, int(k)))
        # same partition up to label permutation: the label<->want map is 1:1
        pairs = set(zip(labels[i].tolist(), want.tolist()))
        assert len(pairs) == len(set(want.tolist()))
        assert len(pairs) == len({a for a, _ in pairs})


def test_get_optimal_k_tie_break_matches_host_oracle():
    """Among equal-score cuts the reference keeps the smallest k (ascending
    sweep, strictly-greater updates); random labels produce such ties often."""
    rng = np.random.RandomState(11)
    for trial in range(4):
        x = jnp.asarray(rng.randn(48, 6).astype(np.float32))
        y = rng.randint(0, 5, 48)
        Z = linkage(x, method="complete", metric="cosine")
        _, k_dev, s_dev = get_optimal_k(jnp.asarray(y), Z, num_class=5, index="iou")
        _, k_host, s_host = get_optimal_k_host(y, np.asarray(Z), index="iou")
        assert float(s_dev) == pytest.approx(s_host, abs=1e-5), trial
        assert int(k_dev) == k_host, trial


def test_mnn_linkage_terminates_on_nan():
    """An all-NaN distance matrix (NaN-diverged embeddings) used to livelock
    the unbounded MNN while_loop (argmin -> 0 everywhere, no mutual leaders,
    cursor stuck); the N-round bound exits with garbage rows instead."""
    from hpcs_tpu.decode.linkage import linkage_from_distances_mnn

    D = jnp.full((32, 32), jnp.nan, jnp.float32)
    Z = np.asarray(linkage_from_distances_mnn(D))
    assert Z.shape == (31, 4)  # contents unspecified — NaN in, garbage out


@pytest.mark.parametrize("method", ["complete", "single", "average"])
def test_mnn_linkage_tie_heavy_duplicates(method):
    """Exact-duplicate points (distance bit-zero blocks — the untrained-
    embedding regime that collapsed MNN to ~2 merges/round before the hash
    tie-break) must still produce a valid dendrogram: scipy-equal height
    multiset, and the cut at k = #groups recovers the duplicate groups."""
    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    rng = np.random.RandomState(11)
    groups = 6
    per = 32
    base = rng.randn(groups, 5).astype(np.float32)
    x = np.repeat(base, per, axis=0)          # 192 points, 6 exact groups
    gt = np.repeat(np.arange(groups), per)
    D = np.asarray(cosine_distance_matrix(jnp.asarray(x)), np.float32)
    D = np.float32(0.5) * (D + D.T)
    assert (D[gt[:, None] == gt[None, :]] == 0).all()

    Z = np.asarray(linkage_from_distances_mnn(jnp.asarray(D), method=method))
    from scipy.cluster.hierarchy import linkage as scipy_linkage
    from scipy.spatial.distance import squareform

    D64 = D.astype(np.float64)
    np.fill_diagonal(D64, 0.0)
    Zs = scipy_linkage(squareform(D64, checks=False), method=method)
    np.testing.assert_allclose(np.sort(Z[:, 2]), np.sort(Zs[:, 2]), atol=1e-6)

    labels = np.asarray(cut_maxclust(jnp.asarray(Z), jnp.int32(groups)))
    from sklearn.metrics.cluster import adjusted_rand_score

    assert adjusted_rand_score(labels, gt) == pytest.approx(1.0)


@pytest.mark.parametrize("method", ["complete", "single", "average"])
def test_fused_nn_reduce_matches_two_pass(method):
    """HPCS_TPU_NN_REDUCE=fused (single variadic lax.reduce for NN + tie
    break) must be BIT-IDENTICAL to the two-pass baseline on random and
    tie-heavy data — the lexicographic (d, h, row) combiner reproduces
    argmin-of-hash-among-ties exactly."""
    import importlib

    L = importlib.import_module("hpcs_tpu.decode.linkage")
    rng = np.random.RandomState(3)
    base = rng.randn(25, 4).astype(np.float32)
    for X in (rng.randn(150, 4).astype(np.float32), np.vstack([base] * 5)):
        D = L.cosine_distance_matrix(jnp.asarray(X))
        old = L._NN_REDUCE_MODE
        try:
            L._NN_REDUCE_MODE = "two_pass"
            Z1 = np.asarray(L.linkage_from_distances_mnn.__wrapped__(
                D, method=method))
            L._NN_REDUCE_MODE = "fused"
            Z2 = np.asarray(L.linkage_from_distances_mnn.__wrapped__(
                D, method=method))
        finally:
            L._NN_REDUCE_MODE = old
        np.testing.assert_array_equal(Z1, Z2)


@pytest.mark.parametrize("knob,value", [
    ("_SCATTER_MODE", "take"),
    ("_COMPACT_MODE", "direct"),
    # at the N=170 test size the cap floor is 64; DIV=1 lifts it to M (merge
    # EVERY mutual pair per round) so the merge schedule genuinely differs.
    # _CASCADE_BIG only binds at M >= 2048 and is not exercised here — it
    # only changes the compaction stage sizes, and compaction exactness at
    # arbitrary sizes is covered by the _COMPACT_MODE rows + stage tests.
    ("_CAP_DIV", 1),
    ("_CAP_CEIL", 64),
])
def test_ab_knobs_bit_identical(knob, value):
    """Every decode A/B knob (benchmarks/decode_knob_ab.py) is a pure
    performance choice: scatter 'take' and compact 'direct' are exact
    selections of the same values, and the cap knobs only change WHICH
    mutual pairs merge per round — exact for reducible linkages (see
    _mnn_round_body).  Z must be BIT-IDENTICAL to the defaults, on random
    and tie-heavy inputs."""
    import importlib

    L = importlib.import_module("hpcs_tpu.decode.linkage")
    rng = np.random.RandomState(11)
    base = rng.randn(30, 4).astype(np.float32)
    for X in (rng.randn(170, 4).astype(np.float32), np.vstack([base] * 6)):
        D = L.cosine_distance_matrix(jnp.asarray(X))
        old = getattr(L, knob)
        Z1 = np.asarray(L.linkage_from_distances_mnn.__wrapped__(
            D, method="average"))
        try:
            setattr(L, knob, value)
            Z2 = np.asarray(L.linkage_from_distances_mnn.__wrapped__(
                D, method="average"))
        finally:
            setattr(L, knob, old)
        np.testing.assert_array_equal(Z1, Z2)
