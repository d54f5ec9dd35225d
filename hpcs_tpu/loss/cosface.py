"""CosFace (large-margin cosine) loss, re-derived from scratch.

Behavioral reference: pytorch_metric_learning's CosFaceLoss as configured by
the reference (margin=0.35, scale=2 — /root/reference/hpcs/loss/
ultrametric_loss.py:37) and the hierarchical variant
(/root/reference/hpcs/loss/hierarchical_cosface_loss.py:9-87).

logits = s * (cos(theta) - m * onehot(target)); loss = mean CE.
The class-weight matrix W lives in the caller's parameter pytree (created by
the model; see hpcs_tpu.models) so the whole loss stays a pure function.
"""
from typing import Sequence

import jax
import jax.numpy as jnp

from ..geometry.math_ops import l2_normalize


def cosface_init(key, embedding_size, num_classes, dtype=jnp.float32):
    """W ~ N(0, 1) [embedding_size, num_classes] (PML initializes its W with
    unit normal entries)."""
    return jax.random.normal(key, (embedding_size, num_classes), dtype)


def cosface_logits(W, embeddings, labels, margin=0.35, scale=2.0):
    """Scaled margin-modified cosine logits [M, L]."""
    emb_n = l2_normalize(embeddings)
    W_n = l2_normalize(W, axis=0)
    cosine = emb_n @ W_n  # [M, L]
    onehot = jax.nn.one_hot(labels, W.shape[1], dtype=cosine.dtype)
    return scale * (cosine - margin * onehot)


def cosface_loss(W, embeddings, labels, margin=0.35, scale=2.0, weights=None):
    """Mean cross-entropy over margin-modified cosine logits."""
    logits = cosface_logits(W, embeddings, labels, margin, scale)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is not None:
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.mean(nll)


def hierarchy_sum_matrices(hierarchy_list, num_classes):
    """Precompute one [L, L] branch-summing matrix per level.

    S_level[j, c] = 1 iff class j belongs to the branch containing class c;
    classes not covered by any branch keep their own probability (identity
    column), matching the reference's behavior where untouched channels keep
    probabilities (hierarchical_cosface_loss.py:13-24; we implement it
    without the aliasing bug noted there since branches within a level are
    disjoint partitions of the leaves).
    """
    mats = []
    for level in hierarchy_list:
        S = jnp.eye(num_classes)
        for branch in level:
            ind = jnp.zeros((num_classes,)).at[jnp.array(branch, jnp.int32)].set(1.0)
            for c in branch:
                S = S.at[:, c].set(ind)
        mats.append(S)
    return mats


def hierarchical_loss(probabilities, labels, sum_matrices):
    """Tree-consistent NLL: at each level, a class's probability is the summed
    probability of its branch (reference hierarchical_loss :9-28)."""
    loss = 0.0
    for S in sum_matrices:
        summed = probabilities @ S  # [M, L]
        logp = jnp.log(jnp.maximum(summed, 1e-12))
        loss = loss + jnp.mean(-jnp.take_along_axis(logp, labels[:, None], -1)[:, 0])
    return loss


def hierarchical_cosface_loss(W, embeddings, labels, sum_matrices, margin=0.35,
                              scale=2.0, weights=None):
    """CosFace probabilities pushed through the per-level branch sums.

    Reference: HierarchicalCosFaceLoss.compute_loss
    (hierarchical_cosface_loss.py:57-87); miner weights default to ones and
    no weight regularizer is configured, matching the reference call site
    (ultrametric_loss.py:161-167).
    """
    logits = cosface_logits(W, embeddings, labels, margin, scale)
    probabilities = jax.nn.softmax(logits, axis=-1)
    loss = 0.0
    n_lvls = 0
    for S in sum_matrices:
        summed = probabilities @ S
        logp = jnp.log(jnp.maximum(summed, 1e-12))
        nll = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        if weights is not None:
            nll = nll * weights
        loss = loss + nll
        n_lvls += 1
    if weights is not None:
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weights) * max(n_lvls, 1), 1e-12) * n_lvls
    return jnp.mean(loss)
