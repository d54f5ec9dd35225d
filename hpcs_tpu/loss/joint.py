"""Joint metric + hyperbolic loss orchestration.

Behavioral reference: MetricHyperbolicLoss / HierarchicalMetricHyperbolicLoss
(/root/reference/hpcs/loss/ultrametric_loss.py:16-176).  The torch classes
hold state (miner, CosFace W, temperature); here everything is a pure
function of (params, batch, rng) driven by a static LossConfig, so the whole
thing jits and shards.
"""
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..miner.triplet import (
    margin_filter,
    sample_balanced_triplets,
    sample_random_triplets,
)
from .cosface import cosface_logits, cosface_loss, hierarchical_cosface_loss
from .hyphc import hyphc_triplet_loss, triplet_margin_loss


@dataclass(frozen=True)
class LossConfig:
    num_class: int
    embedding_size: int
    margin: float = 1.0
    t_per_anchor: int = 50
    fraction: float = 1.2
    cosface: bool = True
    miner: bool = True
    hierarchical: bool = False
    cosface_margin: float = 0.35
    cosface_scale: float = 2.0
    # triplets per step; defaults to t_per_anchor * M at trace time
    num_triplets: Optional[int] = None


def compute_losses(key, cfg: LossConfig, x_poincare, labels, scale, temperature,
                   hierarchy_matrices=None, cosface_W=None):
    """Returns dict(loss_hyp=..., loss_metric=...).

    x_poincare: [M, D] flattened ball embeddings; labels: [M] int32;
    scale: learnable radius parameter; cosface_W: [D, L] (required when
    cfg.cosface).  Mirrors compute_loss (ultrametric_loss.py:114-131): the
    caller applies the trade_off multiplier to loss_hyp.
    """
    M = x_poincare.shape[0]
    k_hyp, k_metric = jax.random.split(key)

    # --- hyperbolic part -------------------------------------------------
    if cfg.miner:
        trip = sample_balanced_triplets(
            k_hyp, labels, cfg.num_class, cfg.t_per_anchor, cfg.fraction,
            num_triplets=cfg.num_triplets,
        )
        # 'easy' filter with margin 0 for the hyp loss (ultrametric_loss.py:34)
        trip = margin_filter(x_poincare, trip, margin=0.0, type_of_triplets="easy")
    else:
        trip = sample_random_triplets(
            k_hyp, M, cfg.t_per_anchor, num_triplets=cfg.num_triplets
        )
    loss_hyp = hyphc_triplet_loss(x_poincare, trip, scale, temperature)

    # --- metric part -----------------------------------------------------
    if cfg.hierarchical:
        loss_metric = hierarchical_cosface_loss(
            cosface_W, x_poincare, labels, hierarchy_matrices,
            margin=cfg.cosface_margin, scale=cfg.cosface_scale,
        )
    elif cfg.cosface:
        loss_metric = cosface_loss(
            cosface_W, x_poincare, labels,
            margin=cfg.cosface_margin, scale=cfg.cosface_scale,
        )
    else:
        trip_m = sample_balanced_triplets(
            k_metric, labels, cfg.num_class, cfg.t_per_anchor, cfg.fraction,
            num_triplets=cfg.num_triplets,
        )
        trip_m = margin_filter(
            x_poincare, trip_m, margin=cfg.margin, type_of_triplets="semihard"
        )
        loss_metric = triplet_margin_loss(x_poincare, trip_m, cfg.margin)

    return {"loss_hyp": loss_hyp, "loss_metric": loss_metric}


def get_logits(cfg: LossConfig, cosface_W, embeddings, labels):
    """CosFace logits for accuracy/IoU metrics (reference get_logits
    :95-112 — identical to the training logits)."""
    return cosface_logits(
        cosface_W, embeddings, labels, margin=cfg.cosface_margin, scale=cfg.cosface_scale
    )
