"""Fixed-shape balanced random triplet mining.

Behavioral reference: the reference's per-label Python loop sampler
(/root/reference/hpcs/miner/loss_and_miner_utils.py:7-75) draws, for each
label l with n_l anchors, k_l = t_per_anchor * (max_count / n_l)^fraction
triplets per anchor — i.e. the expected number of triplets anchored at
element i is proportional to (max_count / n_{label(i)})^fraction.  Its output
size is data-dependent, which XLA cannot compile.

TPU redesign (static shapes, identical sampling distribution):
- sample a fixed number T = t_per_anchor * M of anchors from a categorical
  distribution with weights (max_count / n_i)^fraction (zero for labels that
  cannot form a triplet) — matching the reference's expected per-element
  triplet counts;
- sample positives/negatives *exactly uniformly* via the label-sorted segment
  trick: sort indices by label once; a uniform draw from [0, n_l - 1) shifted
  past the anchor's own rank is uniform over the other same-label elements; a
  uniform draw from [0, M - n_l) shifted past the label's segment is uniform
  over all different-label elements.  No rejection, no dynamic shapes.
- invalid triplets (labels with < 2 members, or no negatives) carry a zero
  weight mask instead of being dropped.

The margin filter of RandomTripletMarginMiner
(/root/reference/hpcs/miner/triplet_margin_miner.py:13-38) becomes a weight
mask as well.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.math_ops import l2_normalize


class Triplets(NamedTuple):
    anchor: jnp.ndarray  # [T] int32
    positive: jnp.ndarray  # [T] int32
    negative: jnp.ndarray  # [T] int32
    mask: jnp.ndarray  # [T] float32 — 1 for valid triplets


def cosine_similarity01(x, y=None):
    """Similarity rescaled to [0, 1]: 0.5 * (1 + cos(x, y)).
    Reference: /root/reference/hpcs/distances/cosine.py:4-16."""
    xn = l2_normalize(x)
    if y is None:
        yn = xn
    else:
        yn = l2_normalize(y)
    return 0.5 * (1.0 + jnp.sum(xn * yn, axis=-1))


def pairwise_cosine_similarity01(x):
    xn = l2_normalize(x)
    return 0.5 * (1.0 + xn @ xn.T)


def sample_balanced_triplets(key, labels, num_classes, t_per_anchor=50, fraction=1.2,
                             num_triplets=None):
    """Sample T class-balanced random triplets with a validity mask.

    labels: [M] int32 in [0, num_classes).  Returns Triplets with arrays of
    length T = num_triplets or t_per_anchor * M.
    """
    M = labels.shape[0]
    T = num_triplets if num_triplets is not None else t_per_anchor * M

    counts = jnp.bincount(labels, length=num_classes)  # [L]
    n_i = counts[labels]  # [M] count of own label
    max_count = jnp.max(counts)

    valid_elem = (n_i >= 2) & ((M - n_i) >= 1)

    # Anchor sampling with per-element weight (max / n_label)^fraction — the
    # reference's per-anchor triplet count k_l (loss_and_miner_utils.py:30).
    # The weight depends only on the *label*, so sample a label from the
    # L-way distribution p(l) ~ n_l * (max / n_l)^fraction, then a uniform
    # member of that label's segment.  (A direct M-way categorical would
    # broadcast the logits to [T, M]: a 3.4e9-element Gumbel tensor at
    # T=400k, M=8k — 300 ms on a v5e; this is [T, L] instead.)
    k_label, k_member, k_pos, k_neg = jax.random.split(key, 4)
    counts_f = counts.astype(jnp.float32)
    label_valid = (counts >= 2) & ((M - counts) >= 1)
    label_logw = jnp.log(counts_f) + fraction * (
        jnp.log(jnp.maximum(max_count.astype(jnp.float32), 1.0))
        - jnp.log(jnp.maximum(counts_f, 1.0))
    )
    label_logw = jnp.where(label_valid, label_logw, -jnp.inf)
    a_lab = jax.random.categorical(k_label, label_logw, shape=(T,))

    # label-sorted segments
    order = jnp.argsort(labels)  # stable
    seg_start = jnp.cumsum(counts) - counts  # [L]

    a_cnt = counts[a_lab]
    a_seg = seg_start[a_lab]
    a_pos_in_seg = jax.random.randint(k_member, (T,), 0, jnp.maximum(a_cnt, 1))
    anchors = order[jnp.clip(a_seg + a_pos_in_seg, 0, M - 1)]

    # positive: uniform over the other (a_cnt - 1) same-label elements
    j = jax.random.randint(k_pos, (T,), 0, jnp.maximum(a_cnt - 1, 1))
    j = jnp.where(j >= a_pos_in_seg, j + 1, j)
    positive = order[jnp.clip(a_seg + j, 0, M - 1)]

    # negative: uniform over the (M - a_cnt) different-label elements
    m = jax.random.randint(k_neg, (T,), 0, jnp.maximum(M - a_cnt, 1))
    m = jnp.where(m >= a_seg, m + a_cnt, m)
    negative = order[jnp.clip(m, 0, M - 1)]

    any_valid = jnp.any(valid_elem)
    mask = (valid_elem[anchors] & any_valid).astype(jnp.float32)
    return Triplets(anchors, positive, negative, mask)


def margin_filter(embeddings, triplets, margin=0.0, type_of_triplets="easy"):
    """Apply the reference miner's margin filter as a mask multiplier.

    With the (inverted) cosine similarity, triplet_margin = sim(a,p) - sim(a,n).
    'easy': keep margin > threshold; 'semihard': 0 < margin <= threshold;
    'hard': margin <= 0; 'all': margin <= threshold.
    (Reference: triplet_margin_miner.py:20-33.)
    """
    ap = cosine_similarity01(embeddings[triplets.anchor], embeddings[triplets.positive])
    an = cosine_similarity01(embeddings[triplets.anchor], embeddings[triplets.negative])
    tm = ap - an
    if type_of_triplets == "easy":
        keep = tm > margin
    elif type_of_triplets == "semihard":
        keep = (tm <= margin) & (tm > 0)
    elif type_of_triplets == "hard":
        keep = (tm <= margin) & (tm <= 0)
    else:  # 'all'
        keep = tm <= margin
    return triplets._replace(mask=triplets.mask * keep.astype(jnp.float32))


def sample_random_triplets(key, num_samples, t_per_anchor, num_triplets=None):
    """Unmined uniform triplets — the JAX analogue of get_triplets
    (/root/reference/hpcs/loss/ultrametric_loss.py:42-55).

    The reference enumerates all i<j pairs x t_per_anchor random k, an
    O(t * M^2) set that is intractable for M = B*N; we draw the same
    distribution by sampling T = t_per_anchor * M (i, j, k) uniformly with
    i != j != k (i != j exact; collisions with k masked).
    """
    M = num_samples
    T = num_triplets if num_triplets is not None else t_per_anchor * M
    ki, kj, kk = jax.random.split(key, 3)
    i = jax.random.randint(ki, (T,), 0, M)
    j = jax.random.randint(kj, (T,), 0, M - 1)
    j = jnp.where(j >= i, j + 1, j)  # exact uniform over j != i
    k = jax.random.randint(kk, (T,), 0, M)
    mask = ((k != i) & (k != j)).astype(jnp.float32)
    return Triplets(i, j, k, mask)
