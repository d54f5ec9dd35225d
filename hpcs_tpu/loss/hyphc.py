"""HypHC-style hyperbolic LCA triplet loss (Chami et al. relaxation).

Behavioral reference: MetricHyperbolicLoss.compute_hyp
(/root/reference/hpcs/loss/ultrametric_loss.py:57-93):
triplets -> cosine similarities (w_ij, w_ik, w_jk) on the raw embeddings ->
normalize each embedding to the common learnable radius -> pairwise LCA
depths -> softmax(lca / temperature) -> loss = mean(sum(sim) - <sim, softmax>)
+ mean of the full similarity matrix.

TPU redesigns:
- triplet sets are fixed-shape with a validity mask (see hpcs_tpu.miner);
  means are mask-weighted;
- the O(M^2) similarity-matrix regularizer mean collapses to a closed form:
  mean_ij 0.5*(1 + x_i . x_j / |x_i||x_j|) = 0.5 + 0.5 * |sum_i x_hat_i|^2 / M^2,
  an O(M d) computation that never materializes the matrix.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.math_ops import l2_normalize

from ..geometry import hyp_lca
from ..miner.triplet import Triplets, cosine_similarity01


def normalize_to_radius(embeddings, scale):
    """Place embeddings on the sphere of radius clamp(scale, 1e-4, 1) — all
    leaves on one diameter (reference normalize_embeddings :139-143)."""
    return l2_normalize(embeddings) * jnp.clip(scale, 1e-4, 1.0)


def mean_pairwise_similarity(x):
    """Closed-form mean of the full [M, M] cosine-similarity01 matrix."""
    xn = l2_normalize(x)
    s = jnp.sum(xn, axis=0)
    M = x.shape[0]
    return 0.5 + 0.5 * jnp.sum(s * s) / (M * M)


def hyphc_triplet_loss(x_poincare, triplets: Triplets, scale, temperature):
    """The Chami et al. continuous-hierarchy loss over a masked triplet set."""
    a, p, n, mask = triplets
    e1 = x_poincare[a]
    e2 = x_poincare[p]
    e3 = x_poincare[n]

    wij = cosine_similarity01(e1, e2)
    wik = cosine_similarity01(e1, e3)
    wjk = cosine_similarity01(e2, e3)

    e1 = normalize_to_radius(e1, scale)
    e2 = normalize_to_radius(e2, scale)
    e3 = normalize_to_radius(e3, scale)

    dij = hyp_lca(e1, e2, return_coord=False)[..., 0]
    dik = hyp_lca(e1, e3, return_coord=False)[..., 0]
    djk = hyp_lca(e2, e3, return_coord=False)[..., 0]

    sim_triplet = jnp.stack([wij, wik, wjk], axis=-1)  # [T, 3]
    lca_triplet = jnp.stack([dij, dik, djk], axis=-1)
    weights = jax.nn.softmax(lca_triplet / temperature, axis=-1)

    w_ord = jnp.sum(sim_triplet * weights, axis=-1)
    total = jnp.sum(sim_triplet, axis=-1) - w_ord

    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(total * mask) / denom
    return loss + mean_pairwise_similarity(x_poincare)


def triplet_margin_loss(embeddings, triplets: Triplets, margin):
    """Similarity-space triplet margin loss with avg-nonzero reduction.

    Reference: the local PML TripletMarginLoss copy
    (/root/reference/hpcs/miner/triplet_margin_loss.py:34-65) with the
    inverted CosineSimilarity distance: violation = sim(a,n) - sim(a,p) + m.
    """
    ap = cosine_similarity01(embeddings[triplets.anchor], embeddings[triplets.positive])
    an = cosine_similarity01(embeddings[triplets.anchor], embeddings[triplets.negative])
    losses = jax.nn.relu(an - ap + margin) * triplets.mask
    nonzero = (losses > 0).astype(jnp.float32)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(nonzero), 1.0)


def anneal_temperature(temperature, anneal_factor, min_scale=0.2, max_scale=1.0):
    """temperature *= clamp(anneal_factor, 0.2, 1).  The reference's version
    crashes on Python floats (ultrametric_loss.py:133-137, torch.clamp on a
    float) — documented bug, implemented correctly here."""
    return temperature * float(jnp.clip(anneal_factor, min_scale, max_scale))
