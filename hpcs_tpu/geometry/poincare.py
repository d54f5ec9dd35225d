"""Poincare-ball (curvature c=1) primitives as pure JAX functions.

Behavioral reference: /root/reference/hpcs/distances/poincare.py:13-136 and
/root/reference/hpcs/utils/poincare.py:50-66 (the embedder's exp map).  All
functions broadcast over leading axes; the manifold coordinates live on the
last axis.  Everything is float32-safe: denominators are clamped at MIN_NORM
and ball projection uses the fp32 boundary eps of the reference.
"""
import jax.numpy as jnp

from .math_ops import artanh, tanh

MIN_NORM = 1e-15
BALL_EPS_F32 = 4e-3
BALL_EPS_F64 = 1e-5


def _sqnorm(x, keepdims=True):
    return jnp.sum(x * x, axis=-1, keepdims=keepdims)


def _norm(x, keepdims=True):
    return jnp.sqrt(jnp.maximum(_sqnorm(x, keepdims), MIN_NORM * MIN_NORM))


def lambda_(x):
    """Conformal factor lambda_x = 2 / (1 - |x|^2)."""
    return 2.0 / jnp.maximum(1.0 - _sqnorm(x), MIN_NORM)


def egrad2rgrad(p, dp):
    """Euclidean -> Riemannian gradient: divide by lambda(p)^2."""
    return dp / lambda_(p) ** 2


def inner(x, u, v=None):
    """Riemannian inner product of tangent vectors at x (keepdims on last axis)."""
    if v is None:
        v = u
    return lambda_(x) ** 2 * jnp.sum(u * v, axis=-1, keepdims=True)


def gyration(u, v, w):
    """Gyration gyr[u, v]w (Mobius-addition associativity correction)."""
    u2 = _sqnorm(u)
    v2 = _sqnorm(v)
    uv = jnp.sum(u * v, axis=-1, keepdims=True)
    uw = jnp.sum(u * w, axis=-1, keepdims=True)
    vw = jnp.sum(v * w, axis=-1, keepdims=True)
    a = -uw * v2 + vw + 2 * uv * vw
    b = -vw * u2 - uw
    d = 1 + 2 * uv + u2 * v2
    return w + 2 * (a * u + b * v) / jnp.maximum(d, MIN_NORM)


def ptransp(x, y, u):
    """Parallel transport of tangent u from x to y."""
    return gyration(y, -x, u) * lambda_(x) / lambda_(y)


def mobius_add(x, y):
    """Mobius addition x (+) y."""
    x2 = _sqnorm(x)
    y2 = _sqnorm(y)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * xy + y2) * x + (1 - x2) * y
    denom = 1 + 2 * xy + x2 * y2
    return num / jnp.maximum(denom, MIN_NORM)


def expmap(u, p):
    """Exponential map of tangent u at point p (argument order as reference)."""
    u_norm = _norm(u)
    second_term = tanh(lambda_(p) * u_norm / 2.0) * u / u_norm
    return mobius_add(p, second_term)


def expmap0(u):
    """Exponential map at the origin: tanh(|u|) * u / |u|.

    Equals the reference embedder's expmap_1(u, 0)
    (/root/reference/hpcs/utils/poincare.py:50-54 with lambda(0)=2).
    """
    u_norm = _norm(u)
    return tanh(u_norm) * u / u_norm


def logmap0(x):
    """Log map at the origin (inverse of expmap0)."""
    x_norm = _norm(x)
    return artanh(x_norm) * x / x_norm


def project(x, eps=None):
    """Clamp points to the open ball of radius 1 - eps."""
    if eps is None:
        eps = BALL_EPS_F64 if x.dtype == jnp.float64 else BALL_EPS_F32
    norm = _norm(x)
    maxnorm = 1.0 - eps
    projected = x / norm * maxnorm
    return jnp.where(norm > maxnorm, projected, x)


def mobius_mul(x, t):
    """Mobius scalar multiplication t (*) x."""
    normx = _norm(x)
    return tanh(t * artanh(normx)) * x / normx


def get_midpoint_o(x):
    """Hyperbolic midpoint between x and the origin."""
    return mobius_mul(x, 0.5)


def hyp_dist_o(x, keepdims=True):
    """Hyperbolic distance of x from the origin: 2 * artanh(|x|)."""
    # MIN_NORM^2 floor under the sqrt: at an exactly-zero input (e.g. the LCA
    # projection of fp32-antipodal embeddings) the clamp branch is selected,
    # so the gradient is 0 like torch's x.norm() subgradient — an unclamped
    # sqrt'(0) = inf turns the masked loss sum into NaN and poisons Adam
    # state.  Forward error: 2*artanh(1e-15) ~ 2e-15, below fp32 resolution
    # of any nonzero distance.
    n = jnp.sqrt(jnp.maximum(_sqnorm(x, keepdims), MIN_NORM * MIN_NORM))
    return 2.0 * artanh(n)


def hyp_distance(x, y):
    """Pairwise-free hyperbolic distance kernel exp(-acosh(dxy)) of the reference
    HyperbolicDistance (/root/reference/hpcs/distances/poincare.py:178-187).
    x, y broadcastable with last axis = coords.
    """
    from .math_ops import arcosh

    x = project(x)
    y = project(y)
    xy = jnp.sum((x - y) ** 2, axis=-1)
    xx = 1.0 - jnp.sum(x * x, axis=-1)
    yy = 1.0 - jnp.sum(y * y, axis=-1)
    dxy = 1.0 + 2.0 * xy / jnp.maximum(xx * yy, MIN_NORM)
    return jnp.exp(-arcosh(dxy))


def hyp_distance_mat(x, y=None):
    """Dense [N, M] version of hyp_distance (reference compute_mat,
    /root/reference/hpcs/distances/poincare.py:146-176)."""
    from .math_ops import arcosh

    if y is None:
        y = x
    x = project(x)
    y = project(y)
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    xy = x2[:, None] + y2[None, :] - 2.0 * x @ y.T
    xy = jnp.maximum(xy, 0.0)
    denom = jnp.maximum((1.0 - x2)[:, None] * (1.0 - y2)[None, :], MIN_NORM)
    dxy = 1.0 + 2.0 * xy / denom
    return jnp.exp(-arcosh(dxy))
