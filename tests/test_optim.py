"""Tests for Riemannian Adam and the plateau LR schedule."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hpcs_tpu.geometry import expmap0, hyp_dist_o
from hpcs_tpu.optim import plateau_init, plateau_update, riemannian_adam

KEY = jax.random.PRNGKey(13)


def _reference_radam_step(point, grad, m, v, step, lr=0.1, b1=0.9, b2=0.999, eps=1e-8):
    """Numpy oracle of one RAdam step (reference radam.py:104-131, with the
    corrected single step increment)."""
    lam = 2.0 / np.maximum(1.0 - (point**2).sum(-1, keepdims=True), 1e-15)
    rgrad = grad / lam**2
    m = b1 * m + (1 - b1) * rgrad
    inner = lam**2 * (rgrad * rgrad).sum(-1, keepdims=True)
    v = b2 * v + (1 - b2) * inner
    denom = np.sqrt(v) + eps
    bc1 = 1 - b1**step
    bc2 = 1 - b2**step
    step_size = lr * bc2**0.5 / bc1
    u = -step_size * m / denom
    # expmap at point
    u_norm = np.maximum(np.sqrt((u**2).sum(-1, keepdims=True)), 1e-15)
    second = np.tanh(lam * u_norm / 2) * u / u_norm
    x, y = point, second
    x2 = (x**2).sum(-1, keepdims=True)
    y2 = (y**2).sum(-1, keepdims=True)
    xy = (x * y).sum(-1, keepdims=True)
    new = ((1 + 2 * xy + y2) * x + (1 - x2) * y) / np.maximum(1 + 2 * xy + x2 * y2, 1e-15)
    # project
    norm = np.maximum(np.sqrt((new**2).sum(-1, keepdims=True)), 1e-15)
    maxn = 1 - 4e-3
    new = np.where(norm > maxn, new / norm * maxn, new)
    return new, m, v


def test_radam_matches_reference_oracle_step1():
    p0 = np.array([[0.1, -0.2, 0.05], [0.3, 0.1, -0.4]], np.float32)
    g0 = np.array([[0.5, 0.2, -0.1], [-0.3, 0.4, 0.2]], np.float32)
    params = {"w": jnp.asarray(p0)}
    tx = riemannian_adam(0.1)
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g0)}, state, params)
    new_params = optax.apply_updates(params, updates)
    want, _, _ = _reference_radam_step(
        p0.astype(np.float64), g0.astype(np.float64),
        np.zeros_like(p0, np.float64), np.zeros_like(p0[..., :1], np.float64), 1,
    )
    np.testing.assert_allclose(np.asarray(new_params["w"]), want, rtol=1e-4, atol=1e-5)


def test_radam_multi_step_stays_in_ball():
    params = {"w": jax.random.normal(KEY, (8, 4)) * 2.0}  # starts outside!
    tx = riemannian_adam(0.5)
    state = tx.init(params)
    key = KEY
    for _ in range(20):
        key = jax.random.fold_in(key, 1)
        grads = {"w": jax.random.normal(key, (8, 4))}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # after the first step, every row is projected into the ball
        assert np.all(np.linalg.norm(np.asarray(params["w"]), axis=-1) <= 1 - 4e-3 + 1e-5)


def test_radam_converges_to_ball_target():
    target = expmap0(jnp.array([0.3, -0.5]))

    def loss_fn(params):
        # hyperbolic distance to target via Euclidean surrogate inside ball
        return jnp.sum((params["x"] - target) ** 2)

    params = {"x": jnp.array([0.0, 0.0])}
    tx = riemannian_adam(0.05)
    state = tx.init(params)
    for _ in range(300):
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["x"]), np.asarray(target), atol=5e-3)


def test_radam_with_inject_hyperparams_lr_mutable():
    params = {"w": jnp.ones((2, 3)) * 0.1}
    tx = optax.inject_hyperparams(riemannian_adam)(learning_rate=0.1)
    state = tx.init(params)
    g = {"w": jnp.ones((2, 3))}
    _, state = tx.update(g, state, params)
    state.hyperparams["learning_rate"] = jnp.asarray(0.05, jnp.float32)
    updates, state = tx.update(g, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_plateau_schedule_matches_reference_semantics():
    s = plateau_init(0.05)
    # improving metric keeps lr
    s = plateau_update(s, 1.0)
    s = plateau_update(s, 0.9)
    assert s.lr == 0.05 and s.num_bad == 0
    # 4 bad epochs tolerated (patience=4), 5th halves
    for _ in range(4):
        s = plateau_update(s, 1.5)
    assert s.lr == 0.05
    s = plateau_update(s, 1.5)
    assert s.lr == pytest.approx(0.025)
    # floor at min_lr
    for _ in range(100):
        s = plateau_update(s, 2.0)
    assert s.lr >= 1e-6


def test_plateau_schedule_matches_torch_trace():
    """Pin plateau_update against torch's ReduceLROnPlateau with the
    reference hyperparameters (factor 0.5, patience 4, default rel
    threshold 1e-4; /root/reference/hpcs/models/base_hyp_hc.py:146-147).
    Includes a flat plateau with 1e-9 jiggle, where an absolute/zero
    threshold would diverge from torch (jiggles counted as improvement)."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.05)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=4, min_lr=1e-6)
    s = plateau_init(0.05)
    metrics = [1.0, 0.9, 0.8]
    metrics += [0.8 - 1e-9, 0.8 + 1e-9] * 6   # flat plateau, tiny jiggle
    metrics += [0.4, 0.4 * (1 - 5e-5)]        # sub-threshold improvement
    metrics += [0.5] * 12                     # decay again
    for m in metrics:
        sched.step(m)
        s = plateau_update(s, m)
        assert s.lr == pytest.approx(opt.param_groups[0]["lr"]), m


# ---------------------------------------------------------------- fused RAdam
def test_fused_radam_matches_per_leaf():
    """riemannian_adam_fused (packed buckets, zero-padded lanes) must produce
    the same trajectories as the per-leaf riemannian_adam on a heterogeneous
    pytree."""
    import optax

    from hpcs_tpu.optim import riemannian_adam, riemannian_adam_fused

    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    params = {
        "a": {"kernel": 0.05 * jax.random.normal(ks[0], (7, 21)),
              "bias": 0.01 * jax.random.normal(ks[1], (21,))},
        "b": {"w": 0.05 * jax.random.normal(ks[2], (3, 5, 130)),
              "scale": jnp.full((1,), 1e-3)},
        "c": 0.02 * jax.random.normal(ks[3], (260,)),
    }
    tx_ref = riemannian_adam(learning_rate=0.05)
    tx_fused = riemannian_adam_fused(learning_rate=0.05)
    s_ref = tx_ref.init(params)
    s_fused = tx_fused.init(params)
    p_ref = params
    p_fused = params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: 0.1 * jax.random.normal(jax.random.fold_in(ks[4], step), p.shape),
            p_ref)
        d_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, d_ref)
        d_fused, s_fused = tx_fused.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, d_fused)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_fused),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7, err_msg=str(ka))


def test_fused_radam_jits_and_converges_to_ball_target():
    import optax

    from hpcs_tpu.geometry import project
    from hpcs_tpu.optim import riemannian_adam_fused

    target = jnp.array([0.3, -0.2, 0.1, 0.05])
    params = {"x": jnp.zeros((4,))}
    tx = riemannian_adam_fused(learning_rate=0.05)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((project(p["x"]) - target) ** 2))(params)
        deltas, state = tx.update(grads, state, params)
        return optax.apply_updates(params, deltas), state, loss

    for _ in range(300):
        params, state, loss = step(params, state)
    assert float(loss) < 1e-4
