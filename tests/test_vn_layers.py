"""Per-layer SO(3) equivariance/invariance tests for the VN library.

The reference only tests end-to-end backbone invariance (and needs the
ShapeNet download + a GUI to do it: test/test_rotation_invariance.py:12-73).
Here every layer is tested in isolation with random rotations — no data.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpcs_tpu.geometry import rot_3d
from hpcs_tpu.nn.vn import (
    VNBatchNorm,
    VNLeakyReLU,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
    invariant_project,
    mean_pool,
)

KEY = jax.random.PRNGKey(42)


def _rand_rotation(key):
    angles = jax.random.uniform(key, (3,)) * 2 * jnp.pi
    return rot_3d(angles[0], angles[1], angles[2])


def _rotate(x, R):
    return jnp.einsum("...v,wv->...w", x, R)


def _check_equivariant(module, x, train=True, atol=1e-5, has_bn=False):
    k1, k2 = jax.random.split(KEY)
    variables = module.init(k1, x) if not has_bn else module.init(k1, x, train=train)
    R = _rand_rotation(k2)

    def apply(v, inp):
        if has_bn:
            out = module.apply(v, inp, train=train, mutable=["batch_stats"] if train else [])
            return out[0] if isinstance(out, tuple) and train else out
        return module.apply(v, inp)

    y = apply(variables, x)
    y_rot = apply(variables, _rotate(x, R))
    np.testing.assert_allclose(np.asarray(y_rot), np.asarray(_rotate(y, R)), atol=atol, rtol=1e-4)
    return variables, y


def test_vn_linear_equivariant():
    x = jax.random.normal(KEY, (2, 16, 8, 3))
    _check_equivariant(VNLinear(12), x)


def test_vn_leaky_relu_equivariant():
    x = jax.random.normal(KEY, (2, 16, 8, 3))
    _check_equivariant(VNLeakyReLU(), x)
    _check_equivariant(VNLeakyReLU(share_nonlinearity=True), x)


def test_vn_leaky_relu_positive_halfspace_identity_region():
    # where <x, d> >= 0 the output must be exactly x (slope path collapses)
    mod = VNLeakyReLU(negative_slope=0.0)
    x = jax.random.normal(KEY, (4, 8, 3))
    v = mod.init(KEY, x)
    d = jnp.einsum("...cv,cd->...dv", x, v["params"]["dir_kernel"])
    y = mod.apply(v, x)
    pos = jnp.sum(x * d, -1) >= 0
    np.testing.assert_allclose(np.asarray(y)[np.asarray(pos)], np.asarray(x)[np.asarray(pos)], atol=1e-6)


def test_vn_batchnorm_equivariant_train_and_eval():
    x = jax.random.normal(KEY, (4, 16, 8, 3))
    mod = VNBatchNorm()
    variables = mod.init(KEY, x, train=True)
    R = _rand_rotation(jax.random.fold_in(KEY, 7))
    y, mut = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    y_rot, _ = mod.apply(variables, _rotate(x, R), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_rot), np.asarray(_rotate(y, R)), atol=1e-5, rtol=1e-4)
    # eval mode with running stats
    ev = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    y_e = mod.apply(ev, x, train=False)
    y_er = mod.apply(ev, _rotate(x, R), train=False)
    np.testing.assert_allclose(np.asarray(y_er), np.asarray(_rotate(y_e, R)), atol=1e-5, rtol=1e-4)


def test_vn_batchnorm_rescales_norms_only():
    # y must equal x / |x| * bn(|x|): direction preserved (up to sign),
    # norms batch-normalized per channel.
    x = jax.random.normal(KEY, (8, 32, 4, 3)) * 3.0 + 1.0
    mod = VNBatchNorm()
    variables = mod.init(KEY, x, train=True)
    y, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    eps = 1e-6
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1) + eps * eps) + eps
    mean = norm.mean(axis=(0, 1))
    var = norm.var(axis=(0, 1))
    expected = x / norm[..., None] * ((norm - mean) / jnp.sqrt(var + 1e-5))[..., None]
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), atol=1e-4, rtol=1e-3)


def test_vn_linear_leaky_relu_equivariant():
    x = jax.random.normal(KEY, (2, 16, 8, 3))
    _check_equivariant(VNLinearLeakyReLU(12), x, has_bn=True)
    _check_equivariant(VNLinearLeakyReLU(12, share_nonlinearity=True), x, has_bn=True)


def test_vn_max_pool_equivariant():
    x = jax.random.normal(KEY, (2, 16, 20, 8, 3))  # [B, N, K, C, 3]
    mod = VNMaxPool()
    variables = mod.init(KEY, x)
    R = _rand_rotation(jax.random.fold_in(KEY, 3))
    y = mod.apply(variables, x)
    assert y.shape == (2, 16, 8, 3)
    y_rot = mod.apply(variables, _rotate(x, R))
    np.testing.assert_allclose(np.asarray(y_rot), np.asarray(_rotate(y, R)), atol=1e-5, rtol=1e-4)


def test_mean_pool():
    x = jax.random.normal(KEY, (2, 16, 20, 8, 3))
    y = mean_pool(x)
    assert y.shape == (2, 16, 8, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x.mean(axis=2)), atol=1e-6)


def test_vn_std_feature_invariant():
    x = jax.random.normal(KEY, (2, 16, 8, 3))
    mod = VNStdFeature()
    variables = mod.init(KEY, x, train=True)
    R = _rand_rotation(jax.random.fold_in(KEY, 11))

    def run(inp):
        (x_std, z0), _ = mod.apply(variables, inp, train=True, mutable=["batch_stats"])
        return x_std, z0

    x_std, z0 = run(x)
    x_std_rot, z0_rot = run(_rotate(x, R))
    # invariant features unchanged under rotation
    np.testing.assert_allclose(np.asarray(x_std_rot), np.asarray(x_std), atol=1e-4, rtol=1e-3)
    # the frame itself is equivariant
    np.testing.assert_allclose(np.asarray(z0_rot), np.asarray(_rotate(z0, R)), atol=1e-4, rtol=1e-3)


def test_vn_std_feature_normalized_frame_orthonormal():
    x = jax.random.normal(KEY, (2, 16, 8, 3))
    mod = VNStdFeature(normalize_frame=True)
    variables = mod.init(KEY, x, train=True)
    (x_std, z0), _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    gram = jnp.einsum("...ij,...kj->...ik", z0, z0)
    eye = jnp.broadcast_to(jnp.eye(3), gram.shape)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(eye), atol=1e-3)


def test_invariant_project_invariance():
    k1, k2 = jax.random.split(KEY)
    x = jax.random.normal(k1, (2, 16, 8, 3))
    mod = VNStdFeature()
    variables = mod.init(KEY, x, train=True)
    R = _rand_rotation(k2)
    (_, z0), _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    (_, z0_rot), _ = mod.apply(variables, _rotate(x, R), train=True, mutable=["batch_stats"])
    skip = jax.random.normal(k2, (2, 16, 4, 3))
    p0 = invariant_project(skip, z0)
    p1 = invariant_project(_rotate(skip, R), z0_rot)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-4, rtol=1e-3)
