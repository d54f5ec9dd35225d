"""The HypHC training system: flax net + jitted train/eval/test steps.

Behavioral reference: BaseSimilarityHypHC
(/root/reference/hpcs/models/base_hyp_hc.py:25-245) and its ShapeNet/PartNet
specializations.  The Lightning module's stateful forward/training_step
becomes a set of pure functions over an explicit TrainState; the per-object
scipy linkage decode of test_step becomes an on-device vmapped
linkage + best-k sweep (hpcs_tpu.decode).
"""
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..decode import get_optimal_k
from ..decode.linkage import cosine_distance_matrix, linkage_from_distances_mnn
from ..geometry import project
from ..loss import LossConfig, compute_losses, get_logits, hierarchy_sum_matrices
from ..loss.hyphc import normalize_to_radius
from ..nn.backbones import VNDGCNNPartSeg
from ..nn.embed import make_embedder
from ..optim import plateau_init, plateau_update, riemannian_adam_fused
from ..utils.metrics import accuracy_top1, multiclass_jaccard
from ..utils.rotations import augment
from .config import ModelConfig


class HypHCNet(nn.Module):
    """Backbone + ball embedder + the learnable loss parameters.

    The learnable radius `scale` (init 1e-3, base_hyp_hc.py:62) and the
    CosFace class-weight matrix live here so the whole system is one params
    pytree under one (Riemannian) optimizer, exactly like the reference.
    """

    backbone: nn.Module
    embedder: Optional[nn.Module]
    hyp_size: int
    num_class: int

    @nn.compact
    def __call__(self, points, decode_vector, train: bool = True):
        scale = self.param("scale", lambda k: jnp.full((1,), 1e-3, jnp.float32))
        _ = self.param(
            "cosface_W", nn.initializers.normal(1.0), (self.hyp_size, self.num_class)
        )
        del scale
        x_euclidean = self.backbone(points, decode_vector, train=train)
        if self.embedder is not None:
            x_poincare = self.embedder(x_euclidean)
        else:
            x_poincare = None
        return x_euclidean, x_poincare


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def build_backbone(cfg: ModelConfig) -> nn.Module:
    from ..nn.backbones import make_backbone

    return make_backbone(cfg)


def build_net(cfg: ModelConfig) -> HypHCNet:
    return HypHCNet(
        backbone=build_backbone(cfg),
        embedder=make_embedder(cfg.eucl_dim, cfg.hyp_dim),
        hyp_size=cfg.hyp_dim,
        num_class=cfg.num_class,
    )


def decode_vector_for_batch(cfg: ModelConfig, batch: Dict[str, jnp.ndarray]):
    """The category conditioning vector fed to the backbone head.

    ShapeNet: one-hot object category [B, 16] (shapenet_hyp_hc.py:84) or the
    per-object part-presence vector when class_vector (:75-82).  PartNet:
    the part-presence vector when class_vector (partnet_hyp_hc.py:93-100),
    else a constant one-hot of the single dummy category (:102-103).
    """
    B = batch["points"].shape[0]
    if cfg.dataset == "partnet" and not cfg.class_vector:
        return jnp.ones((B, 1), jnp.float32)
    if cfg.class_vector:
        labels = batch["labels"]  # [B, N]
        presence = jax.vmap(
            lambda l: jnp.clip(jnp.zeros((cfg.num_class,)).at[l].add(1.0), 0.0, 1.0)
        )(labels)
        return presence
    return jax.nn.one_hot(batch["category"], cfg.num_categories)


class HypHCSystem:
    """Owner of the static config, the flax net, and the jitted step fns."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.net = build_net(cfg)
        self.loss_cfg = LossConfig(
            num_class=cfg.num_class,
            embedding_size=cfg.hyp_dim,
            margin=cfg.margin,
            t_per_anchor=cfg.t_per_anchor,
            fraction=cfg.fraction,
            cosface=cfg.cosface,
            miner=cfg.miner,
            hierarchical=cfg.use_hierarchical,
            num_triplets=cfg.num_triplets,
        )
        self.hierarchy_matrices = (
            hierarchy_sum_matrices(
                [list(map(list, lvl)) for lvl in cfg.hierarchy_list], cfg.num_class
            )
            if cfg.use_hierarchical
            else None
        )
        # fused = packed-bucket RAdam: numerically identical to the per-leaf
        # form (tests/test_optim.py) at ~10x fewer TPU kernels per step
        self.tx = optax.inject_hyperparams(riemannian_adam_fused)(learning_rate=cfg.lr)
        # host-side schedule state (ReduceLROnPlateau, temperature annealing)
        self.plateau = plateau_init(cfg.lr)
        self.temperature = cfg.temperature

    # ------------------------------------------------------------------ init
    def init(self, key, sample_batch) -> TrainState:
        k_params, k_drop = jax.random.split(key)
        dv = decode_vector_for_batch(self.cfg, sample_batch)
        # jit the initializer: eager flax init dispatches thousands of tiny
        # ops (2 minutes over a remote-TPU link); compiled it is sub-second
        init_fn = jax.jit(lambda rngs, pts, d: self.net.init(rngs, pts, d, train=False))
        variables = init_fn(
            {"params": k_params, "dropout": k_drop},
            jnp.asarray(sample_batch["points"]), dv,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros([], jnp.int32),
        )

    # ------------------------------------------------------------- forward
    def _apply(self, params, batch_stats, points, decode_vector, train, dropout_key=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (x_e, x_p), mutated = self.net.apply(
                variables, points, decode_vector, train=True,
                rngs={"dropout": dropout_key}, mutable=["batch_stats"],
            )
            return x_e, x_p, mutated["batch_stats"]
        x_e, x_p = self.net.apply(variables, points, decode_vector, train=False)
        return x_e, x_p, batch_stats

    def _losses_and_metrics(self, key, params, x_poincare, labels, temperature):
        flat = x_poincare.reshape(-1, x_poincare.shape[-1])
        labels_flat = labels.reshape(-1)
        losses = compute_losses(
            key, self.loss_cfg, flat, labels_flat,
            params["scale"][0], temperature,
            hierarchy_matrices=self.hierarchy_matrices,
            cosface_W=params["cosface_W"],
        )
        out = {
            "loss_metric": losses["loss_metric"],
            "loss_hyp": losses["loss_hyp"] * self.cfg.trade_off,
        }
        metrics = {}
        if self.cfg.cosface or self.cfg.use_hierarchical:
            logits = get_logits(self.loss_cfg, params["cosface_W"], flat, labels_flat)
            metrics["acc"] = accuracy_top1(logits, labels_flat)
            metrics["iou"] = multiclass_jaccard(logits, labels_flat, self.cfg.num_class)
        return out, metrics

    # ---------------------------------------------------------------- steps
    def grads_and_logs(self, state: TrainState, batch, key, temperature):
        """Loss gradients + diagnostics for one (possibly per-device) batch.
        Shared by the single-device and shard_map data-parallel steps."""
        k_rot, k_drop, k_loss = jax.random.split(key, 3)
        points = augment(k_rot, batch["points"], self.cfg.train_rotation)

        def loss_fn(params):
            dv = decode_vector_for_batch(self.cfg, batch)
            x_e, x_p, new_bs = self._apply(
                params, state.batch_stats, points, dv, True, k_drop
            )
            losses, metrics = self._losses_and_metrics(
                k_loss, params, x_p, batch["labels"], temperature
            )
            total = losses["loss_metric"] + losses["loss_hyp"]
            return total, (losses, metrics, new_bs)

        (total, (losses, metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        logs = {"total_loss": total, **losses, **metrics,
                "scale": state.params["scale"][0]}
        return grads, logs, new_bs

    def apply_gradients(self, state: TrainState, grads, new_bs) -> TrainState:
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: TrainState, batch, key, temperature):
        grads, logs, new_bs = self.grads_and_logs(state, batch, key, temperature)
        return self.apply_gradients(state, grads, new_bs), logs

    @partial(jax.jit, static_argnames=("self",))
    def eval_step(self, state: TrainState, batch, key, temperature):
        # validation matches the reference's forward(testing=False), which
        # rotates with TRAIN_rotation (shapenet_hyp_hc.py:55-61;
        # base_hyp_hc.py:179-180) — test_rotation is for test_step only
        k_rot, k_loss = jax.random.split(key)
        points = augment(k_rot, batch["points"], self.cfg.train_rotation)
        dv = decode_vector_for_batch(self.cfg, batch)
        x_e, x_p, _ = self._apply(state.params, state.batch_stats, points, dv, False)
        losses, metrics = self._losses_and_metrics(
            k_loss, state.params, x_p, batch["labels"], temperature
        )
        logs = {"val_loss": losses["loss_metric"] + losses["loss_hyp"], **metrics}
        return logs

    @partial(jax.jit, static_argnames=("self",))
    def test_step(self, state: TrainState, batch, key, temperature):
        """Full decode path: losses + per-object linkage + best-k score
        (reference test_step base_hyp_hc.py:192-245, minus plotting)."""
        k_rot, k_loss = jax.random.split(key)
        points = augment(k_rot, batch["points"], self.cfg.test_rotation)
        dv = decode_vector_for_batch(self.cfg, batch)
        x_e, x_p, _ = self._apply(state.params, state.batch_stats, points, dv, False)
        losses, metrics = self._losses_and_metrics(
            k_loss, state.params, x_p, batch["labels"], temperature
        )

        scale = state.params["scale"][0]

        def decode_one(emb, labels):
            leaves = project(normalize_to_radius(emb, scale))
            Z = linkage_from_distances_mnn(cosine_distance_matrix(leaves), method="complete")
            pred, best_k, best_score = get_optimal_k(
                labels, Z, num_class=self.cfg.num_class, index="iou"
            )
            return pred, best_k, best_score, Z

        preds, best_ks, best_scores, Zs = jax.vmap(decode_one)(x_p, batch["labels"])
        logs = {
            "test_loss": losses["loss_metric"] + losses["loss_hyp"],
            "score": jnp.mean(best_scores),
            **{f"test_{k}": v for k, v in metrics.items()},
        }
        return logs, {"pred": preds, "best_k": best_ks, "best_score": best_scores,
                      "linkage": Zs, "x_poincare": x_p, "x_euclidean": x_e}

    # ------------------------------------------------------------ schedules
    def epoch_end(self, epoch: int, val_loss: float):
        """Host-side epoch hooks: plateau LR + temperature annealing
        (reference base_hyp_hc.py:142-177)."""
        from ..loss import anneal_temperature

        self.plateau = plateau_update(self.plateau, val_loss)
        if epoch and self.cfg.anneal_step > 0 and epoch % self.cfg.anneal_step == 0:
            self.temperature = anneal_temperature(self.temperature, self.cfg.anneal_factor)
        return self.plateau.lr

    def set_learning_rate(self, state: TrainState, lr: float) -> TrainState:
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state
