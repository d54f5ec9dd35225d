"""Hyperbolic least-common-ancestor (LCA) constructions on the Poincare ball.

Two distinct constructions exist in the reference and both are provided here:

1. ``hyp_lca`` — projection of the origin onto the geodesic between a and b,
   the HypHC (Chami et al.) LCA used by the training loss.  Behavioral
   reference: /root/reference/hpcs/distances/lca.py:37-52, which uses circle
   inversions centered at a/|a|^2.  That formulation is numerically unstable
   in float32 when |a| is small (the inversion center diverges), so we use an
   algebraically equivalent gyro-translation construction instead: map a to
   the origin with the Mobius translation x -> (-a) (+) x (an isometry), where
   the geodesic becomes a straight line through the origin; hyperbolically
   project the translated origin onto that line (reflect + gyro-midpoint);
   map back via left-cancellation a (+) ((-a) (+) x) = x.  All intermediates
   stay O(1), and the result matches the reference construction to fp32
   precision away from its ill-conditioned region.

2. ``hyp_lca_mat`` — the *midpoint*-based pairwise matrix
   min(d_o(x), d_o(y), d_o(midpoint(x, y))) of the reference's
   HyperbolicLCA distance class
   (/root/reference/hpcs/distances/poincare.py:197-221).  The reference
   builds it with complex-plane Mobius maps and therefore only supports 2-D
   embeddings; the gyro form here is dimension-agnostic.
"""
import jax.numpy as jnp

from .poincare import (
    MIN_NORM,
    get_midpoint_o,
    hyp_dist_o,
    mobius_add,
    mobius_mul,
    project,
)


def euc_reflection(x, a):
    """Euclidean (= hyperbolic) reflection of x across the line through a and o."""
    xTa = jnp.sum(x * a, axis=-1, keepdims=True)
    norm_a_sq = jnp.maximum(jnp.sum(a**2, axis=-1, keepdims=True), MIN_NORM)
    proj = xTa * a / norm_a_sq
    return 2 * proj - x


def gyro_midpoint(x, y):
    """Hyperbolic midpoint of the geodesic segment [x, y]."""
    return mobius_add(x, mobius_mul(mobius_add(-x, y), 0.5))


def hyp_lca(a, b, return_coord=True):
    """Projection of the origin onto the geodesic between ball points a and b.

    With return_coord=False returns the LCA *depth* d(o, proj) — the quantity
    consumed by the HypHC loss.  Broadcastable over leading axes.
    """
    # frame where a -> origin; the geodesic (a, b) becomes the line (o, c)
    c = mobius_add(-a, b)
    p = -a  # image of the origin in that frame
    # hyperbolic projection of p onto the line through o and c: reflect p
    # across the line (Euclidean = hyperbolic for diameters), then take the
    # hyperbolic midpoint of p and its mirror image, which lies on the line.
    p_ref = euc_reflection(p, c)
    proj_frame = gyro_midpoint(p, p_ref)
    proj = mobius_add(a, proj_frame)  # left-cancellation inverse of (-a) (+) .
    if not return_coord:
        return hyp_dist_o(proj)
    return proj


def hyp_lca_midpoint(a, b):
    """Geodesic midpoint of [a, b] via the same frame trick (N-D safe)."""
    return mobius_add(a, get_midpoint_o(mobius_add(-a, b)))


def hyp_lca_mat(x, y=None):
    """Dense pairwise matrix min(d_o(x_i), d_o(y_j), d_o(midpoint(x_i, y_j))).

    Parity target: HyperbolicLCA.compute_mat
    (/root/reference/hpcs/distances/poincare.py:197-221).
    """
    if y is None:
        y = x
    x = project(x)
    y = project(y)
    dox = hyp_dist_o(x)  # [N, 1]
    doy = hyp_dist_o(y)  # [M, 1]
    mid = hyp_lca_midpoint(x[:, None, :], y[None, :, :])
    dom = hyp_dist_o(mid)[..., 0]  # [N, M]
    return jnp.minimum(jnp.minimum(dox, doy.T), dom)
