"""Property tests for the Poincare-ball geometry core.

Coverage the reference lacks entirely (its only test is an end-to-end
rotation-invariance check requiring the dataset): ball-closure of maps,
Mobius identities, artanh/arcosh boundary gradients, LCA correctness against
an independent 2-D complex-Mobius construction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hpcs_tpu.geometry import (
    arcosh,
    artanh,
    expmap,
    expmap0,
    gyration,
    hyp_dist_o,
    hyp_lca,
    hyp_lca_mat,
    inner,
    lambda_,
    logmap0,
    mobius_add,
    mobius_mul,
    project,
    ptransp,
    rot_3d,
)

KEY = jax.random.PRNGKey(0)


def _rand_ball(key, shape, radius=0.9):
    u = jax.random.normal(key, shape)
    n = jnp.linalg.norm(u, axis=-1, keepdims=True)
    r = jax.random.uniform(jax.random.fold_in(key, 1), shape[:-1] + (1,)) * radius
    return u / n * r


def test_project_stays_in_ball():
    x = jax.random.normal(KEY, (128, 4)) * 10.0
    p = project(x)
    assert jnp.all(jnp.linalg.norm(p, axis=-1) <= 1.0 - 4e-3 + 1e-5)
    # points already inside are untouched
    y = _rand_ball(KEY, (64, 4), radius=0.5)
    np.testing.assert_allclose(project(y), y, rtol=0, atol=0)


def test_expmap0_logmap0_roundtrip():
    u = jax.random.normal(KEY, (64, 8)) * 0.5
    x = expmap0(u)
    assert jnp.all(jnp.linalg.norm(x, axis=-1) < 1.0)
    np.testing.assert_allclose(logmap0(x), u, rtol=2e-3, atol=1e-4)


def test_hyp_dist_o_of_expmap0():
    # d(o, exp_o(u)) = 2*artanh(tanh(|u|)) = 2|u|
    u = jax.random.normal(KEY, (32, 3)) * 0.3
    d = hyp_dist_o(expmap0(u))[..., 0]
    np.testing.assert_allclose(d, 2 * jnp.linalg.norm(u, axis=-1), rtol=1e-3, atol=5e-4)


def test_mobius_add_identities():
    x = _rand_ball(KEY, (32, 5))
    zeros = jnp.zeros_like(x)
    np.testing.assert_allclose(mobius_add(x, zeros), x, atol=1e-6)
    np.testing.assert_allclose(mobius_add(zeros, x), x, atol=1e-6)
    np.testing.assert_allclose(mobius_add(x, -x), zeros, atol=1e-5)


def test_mobius_mul_is_geodesic_scaling():
    x = _rand_ball(KEY, (32, 4))
    half = mobius_mul(x, 0.5)
    np.testing.assert_allclose(
        hyp_dist_o(half), 0.5 * hyp_dist_o(x), rtol=1e-3, atol=5e-4
    )


def test_gyration_is_isometry_at_origin():
    k1, k2, k3 = jax.random.split(KEY, 3)
    u = _rand_ball(k1, (16, 4))
    v = _rand_ball(k2, (16, 4))
    w = jax.random.normal(k3, (16, 4))
    np.testing.assert_allclose(
        jnp.linalg.norm(gyration(u, v, w), axis=-1),
        jnp.linalg.norm(w, axis=-1),
        rtol=1e-4,
    )


def test_ptransp_preserves_inner_product():
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    x = _rand_ball(k1, (16, 4), radius=0.6)
    y = _rand_ball(k2, (16, 4), radius=0.6)
    u = jax.random.normal(k3, (16, 4))
    v = jax.random.normal(k4, (16, 4))
    lhs = inner(x, u, v)
    rhs = inner(y, ptransp(x, y, u), ptransp(x, y, v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-4)


def test_expmap_matches_expmap0_at_origin():
    u = jax.random.normal(KEY, (16, 4)) * 0.4
    np.testing.assert_allclose(expmap(u, jnp.zeros_like(u)), expmap0(u), atol=1e-6)


def test_artanh_boundary_gradient_is_finite_nonzero():
    g = jax.grad(lambda x: artanh(x))(jnp.float32(0.999999))
    assert jnp.isfinite(g) and g > 0
    g2 = jax.grad(lambda x: artanh(x))(jnp.float32(1.5))  # outside domain
    assert jnp.isfinite(g2) and g2 > 0


def test_arcosh_boundary_gradient_is_finite():
    g = jax.grad(lambda x: arcosh(x))(jnp.float32(1.0))
    assert jnp.isfinite(g) and g > 0


# ---------------------------------------------------------------------------
# LCA: cross-validate the N-D reflection construction against an independent
# 2-D complex-Mobius implementation (the reference's other construction,
# /root/reference/hpcs/distances/poincare.py:197-221).
# ---------------------------------------------------------------------------

def _lca_depth_complex_2d(a, b):
    """LCA depth via Mobius transform in the complex plane (numpy, 2-D only)."""
    z = a[..., 0] + 1j * a[..., 1]
    w = b[..., 0] + 1j * b[..., 1]
    # map a -> 0, w -> M(w)
    mw = (w - z) / (1 - np.conj(z) * w)
    # hyperbolic midpoint between o and M(w)
    n = np.abs(mw)
    mid = np.tanh(0.5 * np.arctanh(np.clip(n, 0, 1 - 1e-7))) * mw / np.maximum(n, 1e-15)
    # map back
    m = (mid + z) / (1 + np.conj(z) * mid)
    dom = 2 * np.arctanh(np.clip(np.abs(m), 0, 1 - 1e-7))
    dox = 2 * np.arctanh(np.clip(np.abs(z), 0, 1 - 1e-7))
    doy = 2 * np.arctanh(np.clip(np.abs(w), 0, 1 - 1e-7))
    return np.minimum(np.minimum(dox, doy), dom)


def test_hyp_lca_mat_matches_complex_construction_2d():
    rng = np.random.RandomState(0)
    x = rng.randn(24, 2).astype(np.float32)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True) * rng.uniform(0.05, 0.8, (24, 1))
    got = np.asarray(hyp_lca_mat(jnp.asarray(x)))
    want = _lca_depth_complex_2d(x[:, None, :], x[None, :, :])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def _lca_projection_depth_inversion_f64(a, b):
    """Float64 numpy oracle: the reference's circle-inversion construction of
    the origin's projection onto geodesic(a, b)
    (/root/reference/hpcs/distances/lca.py:37-52)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)

    def isom(c, x):
        r2 = np.sum(c**2, -1, keepdims=True) - 1.0
        u = x - c
        return r2 / np.sum(u**2, -1, keepdims=True) * u + c

    r = a / np.sum(a**2, -1, keepdims=True)
    b_inv = isom(r, b)
    xTa = np.sum(a * b_inv, -1, keepdims=True)
    o_inv_ref = 2 * xTa * b_inv / np.sum(b_inv**2, -1, keepdims=True) - a
    o_ref = isom(r, o_inv_ref)
    proj = o_ref / (1.0 + np.sqrt(np.maximum(1 - np.sum(o_ref**2, -1, keepdims=True), 0)))
    return 2 * np.arctanh(np.clip(np.linalg.norm(proj, axis=-1), 0, 1 - 1e-12))


def test_hyp_lca_matches_reference_inversion_construction():
    rng = np.random.RandomState(1)
    for dim in (2, 3, 16):
        a = rng.randn(256, dim)
        a = a / np.linalg.norm(a, axis=-1, keepdims=True) * rng.uniform(1e-3, 0.95, (256, 1))
        b = rng.randn(256, dim)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True) * rng.uniform(1e-3, 0.95, (256, 1))
        got = np.asarray(
            hyp_lca(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32), return_coord=False)
        )[..., 0]
        want = _lca_projection_depth_inversion_f64(a, b)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_hyp_lca_depth_bounded_by_endpoints():
    k1, k2 = jax.random.split(KEY)
    a = _rand_ball(k1, (64, 4))
    b = _rand_ball(k2, (64, 4))
    d = hyp_lca(a, b, return_coord=False)[..., 0]
    da = hyp_dist_o(a)[..., 0]
    db = hyp_dist_o(b)[..., 0]
    assert jnp.all(d <= jnp.minimum(da, db) + 1e-4)


def test_hyp_lca_symmetric():
    k1, k2 = jax.random.split(KEY)
    a = _rand_ball(k1, (64, 3))
    b = _rand_ball(k2, (64, 3))
    dab = hyp_lca(a, b, return_coord=False)
    dba = hyp_lca(b, a, return_coord=False)
    np.testing.assert_allclose(dab, dba, rtol=2e-3, atol=5e-4)


def test_hyp_lca_rotation_invariant_depth():
    # LCA depth only depends on the configuration, so it is SO(3)-invariant.
    k1, k2, k3 = jax.random.split(KEY, 3)
    a = _rand_ball(k1, (32, 3))
    b = _rand_ball(k2, (32, 3))
    angles = jax.random.uniform(k3, (3,)) * 2 * jnp.pi
    R = rot_3d(angles[0], angles[1], angles[2])
    d0 = hyp_lca(a, b, return_coord=False)
    d1 = hyp_lca(a @ R.T, b @ R.T, return_coord=False)
    # fp32: deep-LCA configurations are ill-conditioned; 1e-2 abs is the
    # observed fp32 noise floor of the construction itself.
    np.testing.assert_allclose(d0, d1, rtol=1e-2, atol=1e-2)


def test_hyp_lca_differentiable():
    k1, k2 = jax.random.split(KEY)
    a = _rand_ball(k1, (8, 3))
    b = _rand_ball(k2, (8, 3))
    g = jax.grad(lambda a, b: jnp.sum(hyp_lca(a, b, return_coord=False)))(a, b)
    assert jnp.all(jnp.isfinite(g))


def test_hyp_dist_o_zero_input_grad_finite():
    """sqrt'(0)=inf used to NaN the gradient at an exactly-zero LCA
    projection (fp32-antipodal embeddings); the MIN_NORM^2 floor selects the
    clamp branch -> 0 gradient, matching torch's norm() subgradient."""
    from hpcs_tpu.geometry.poincare import hyp_dist_o

    g = jax.grad(lambda x: jnp.sum(hyp_dist_o(x)))(jnp.zeros((3, 2)))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) == 0.0
    # forward at zero is (numerically) zero
    assert float(jnp.squeeze(hyp_dist_o(jnp.zeros((1, 2))))) < 1e-12
