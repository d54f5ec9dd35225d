"""Pallas kNN kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.ops import knn
from hpcs_tpu.ops.pallas import knn_pallas

KEY = jax.random.PRNGKey(17)


@pytest.mark.parametrize("shape,k", [((2, 128, 3), 8), ((1, 256, 16), 20)])
def test_knn_pallas_matches_xla(shape, k):
    x = jax.random.normal(KEY, shape)
    got = np.asarray(knn_pallas(x, k, interpret=True))
    want = np.asarray(knn(x, k))
    # neighbor *sets* must match; order can differ only on exact ties, which
    # random data avoids — compare directly
    np.testing.assert_array_equal(got, want)


def test_knn_pallas_self_first():
    x = jax.random.normal(KEY, (1, 64, 3))
    idx = np.asarray(knn_pallas(x, 4, interpret=True))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(64))


def test_knn_pallas_fallback_on_untileable():
    x = jax.random.normal(KEY, (1, 31, 3))  # 31 not tileable
    got = np.asarray(knn_pallas(x, 4, interpret=True))
    want = np.asarray(knn(x, 4))
    np.testing.assert_array_equal(got, want)


def test_knn_modes_match_xla_oracle():
    """All precision modes must reproduce the fp32 XLA neighbor sets in
    interpret mode (no real bf16 loss on CPU, but the limb-splitting and the
    D<=4 elementwise path are exercised end to end)."""
    from hpcs_tpu.ops.knn import knn as knn_xla

    key = jax.random.PRNGKey(5)
    for D in (3, 63):
        x = jax.random.normal(key, (2, 64, D))
        want = np.sort(np.asarray(knn_xla(x, 8)), -1)
        for mode in ("exact", "split", "fast"):
            got = np.sort(np.asarray(knn_pallas(x, 8, interpret=True, mode=mode)), -1)
            agree = np.mean(got == want)
            assert agree > 0.999, (D, mode, agree)


def test_knn_legacy_exact_alias():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (1, 32, 3))
    a = np.asarray(knn_pallas(x, 4, interpret=True, exact=True))
    b = np.asarray(knn_pallas(x, 4, interpret=True, mode="exact"))
    np.testing.assert_array_equal(a, b)
