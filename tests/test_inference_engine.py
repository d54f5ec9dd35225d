"""Fused inference engine vs the flax graph: numerical parity on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.models import HypHCSystem, ModelConfig
from hpcs_tpu.models.inference import vn_dgcnn_fast_forward
from hpcs_tpu.ops.pallas.edgeconv_pallas import fused_edgeconv_infer, _edgeconv_xla

KEY = jax.random.PRNGKey(41)


def _bn(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    return dict(
        scale=1.0 + 0.1 * jax.random.normal(k1, (c,)),
        bias=0.1 * jax.random.normal(k2, (c,)),
        mean=0.1 * jax.random.normal(k3, (c,)),
        var=jnp.abs(1.0 + 0.1 * jax.random.normal(k3, (c,))),
    )


@pytest.mark.parametrize("n_convs", [1, 2])
def test_fused_edgeconv_matches_xla(n_convs):
    B, N, K, C, C1, C2 = 2, 64, 8, 4, 6, 5
    x = jax.random.normal(KEY, (B, N, C, 3))
    idx = jax.random.randint(jax.random.fold_in(KEY, 1), (B, N, K), 0, N)
    W1 = jax.random.normal(jax.random.fold_in(KEY, 2), (2 * C, C1)) * 0.3
    Wd1 = jax.random.normal(jax.random.fold_in(KEY, 3), (2 * C, C1)) * 0.3
    bn1 = _bn(jax.random.fold_in(KEY, 4), C1)
    W2 = jax.random.normal(jax.random.fold_in(KEY, 5), (C1, C2)) * 0.3
    Wd2 = jax.random.normal(jax.random.fold_in(KEY, 6), (C1, C2)) * 0.3
    bn2 = _bn(jax.random.fold_in(KEY, 7), C2)

    got = fused_edgeconv_infer(x, idx, W1, Wd1, bn1, W2, Wd2, bn2,
                               interpret=True, n_convs=n_convs)
    from hpcs_tpu.ops.pallas.edgeconv_pallas import _affine_from_bn

    a1, b1 = _affine_from_bn(**bn1)
    a2, b2 = _affine_from_bn(**bn2)
    want = _edgeconv_xla(x, idx, W1, Wd1, jnp.stack([a1, b1]), W2, Wd2,
                         jnp.stack([a2, b2]), 0.2, n_convs)
    expected_c = C2 if n_convs == 2 else C1
    assert got.shape == (B, N, expected_c, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_fast_forward_matches_flax_graph():
    cfg = ModelConfig(dataset="shapenet", num_class=10, num_categories=4,
                      fixed_points=64, eucl_dim=8, hyp_dim=8, k=8)
    system = HypHCSystem(cfg)
    pts = jax.random.normal(KEY, (2, 64, 3))
    batch = {"points": pts, "labels": jnp.zeros((2, 64), jnp.int32),
             "category": jnp.zeros((2,), jnp.int32)}
    state = system.init(KEY, batch)
    dv = jax.nn.one_hot(batch["category"], 4)
    want_e, want_p = system.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, pts, dv,
        train=False,
    )
    got_e, got_p = vn_dgcnn_fast_forward(state.params, state.batch_stats, pts, dv,
                                         k=cfg.k)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p), atol=2e-4,
                               rtol=1e-3)


def test_fast_forward_with_mlp_embedder():
    cfg = ModelConfig(dataset="shapenet", num_class=10, num_categories=4,
                      fixed_points=64, eucl_dim=8, hyp_dim=4, k=8)
    system = HypHCSystem(cfg)
    pts = jax.random.normal(KEY, (1, 64, 3))
    batch = {"points": pts, "labels": jnp.zeros((1, 64), jnp.int32),
             "category": jnp.zeros((1,), jnp.int32)}
    state = system.init(KEY, batch)
    dv = jax.nn.one_hot(batch["category"], 4)
    want_e, want_p = system.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, pts, dv,
        train=False,
    )
    got_e, got_p = vn_dgcnn_fast_forward(state.params, state.batch_stats, pts, dv,
                                         k=cfg.k)
    assert got_p.shape == (1, 64, 4)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p), atol=2e-4,
                               rtol=1e-3)
