"""Numerically safe inverse-hyperbolic primitives with boundary-stable gradients.

The reference implements these as custom torch autograd Functions that clamp the
forward input and compute the backward pass against the *clamped* value
(/root/reference/hpcs/utils/math.py:61-129).  Plain autodiff through a clamp
would zero the gradient outside the clamp region; for embeddings pinned at the
Poincare-ball boundary that kills learning, so we reproduce the same "clamp
forward, differentiate at the clamped point" rule with jax.custom_jvp.

The reference upcasts to float64 for the forward log/sqrt; on TPU we stay in
float32 (fp64 is emulated and slow) with identical clamps — validated by the
geometry property tests.
"""
from functools import partial

import jax
import jax.numpy as jnp

ARTANH_EPS = 1e-5
ARCOSH_EPS = 1e-7
TANH_CLAMP = 15.0


@jax.custom_jvp
def artanh(x):
    x = jnp.clip(x, -1.0 + ARTANH_EPS, 1.0 - ARTANH_EPS)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


@artanh.defjvp
def _artanh_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xc = jnp.clip(x, -1.0 + ARTANH_EPS, 1.0 - ARTANH_EPS)
    y = 0.5 * (jnp.log1p(xc) - jnp.log1p(-xc))
    return y, dx / (1.0 - xc**2)


@jax.custom_jvp
def arcosh(x):
    x = jnp.maximum(x, 1.0 + ARCOSH_EPS)
    return jnp.log(jnp.maximum(x + jnp.sqrt(x**2 - 1.0), 1e-15))


@arcosh.defjvp
def _arcosh_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xc = jnp.maximum(x, 1.0 + ARCOSH_EPS)
    y = jnp.log(jnp.maximum(xc + jnp.sqrt(xc**2 - 1.0), 1e-15))
    return y, dx / jnp.sqrt(xc**2 - 1.0)


@jax.custom_jvp
def arsinh(x):
    return jnp.log(jnp.maximum(x + jnp.sqrt(1.0 + x**2), 1e-15))


@arsinh.defjvp
def _arsinh_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.log(jnp.maximum(x + jnp.sqrt(1.0 + x**2), 1e-15))
    return y, dx / jnp.sqrt(1.0 + x**2)


def tanh(x):
    """tanh with the reference's +-15 input clamp (utils/math.py:78-79)."""
    return jnp.tanh(jnp.clip(x, -TANH_CLAMP, TANH_CLAMP))


def cosh(x, clamp=TANH_CLAMP):
    return jnp.cosh(jnp.clip(x, -clamp, clamp))


def sinh(x, clamp=TANH_CLAMP):
    return jnp.sinh(jnp.clip(x, -clamp, clamp))


# ----------------------------------------------------------------------------
# Euler-angle rotations (reference: hpcs/utils/math.py:6-56); used by the
# rotation-invariance test suite and z-axis augmentation.
# ----------------------------------------------------------------------------

def yaw_rot(alpha):
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def pitch_rot(beta):
    c, s = jnp.cos(beta), jnp.sin(beta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def roll_rot(gamma):
    c, s = jnp.cos(gamma), jnp.sin(gamma)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)], -2
    )


def rot_3d(yaw, pitch, roll):
    """Composed rotation R = R_yaw @ R_pitch @ R_roll."""
    return yaw_rot(yaw) @ pitch_rot(pitch) @ roll_rot(roll)


def l2_normalize(x, axis=-1, eps=1e-12):
    """x / max(|x|, eps) — the one shared clamped-normalize (miner cosine,
    HypHC radius normalization, CosFace logits all use this exact form; a
    single definition keeps their similarity scales in sync)."""
    import jax.numpy as jnp

    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
