"""Classification metrics computed on device.

Equivalents of the reference's torchmetrics Accuracy(top_k=1) and
MulticlassJaccardIndex (/root/reference/hpcs/models/base_hyp_hc.py:74-75).
"""
import jax.numpy as jnp


def accuracy_top1(logits, labels):
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def multiclass_jaccard(logits, labels, num_class):
    """Macro-averaged IoU over classes present in prediction or target
    (torchmetrics MulticlassJaccardIndex semantics: classes absent from both
    are excluded from the average)."""
    preds = jnp.argmax(logits, axis=-1)
    eq = preds == labels
    inter = jnp.zeros((num_class,)).at[labels].add(eq.astype(jnp.float32))
    count_t = jnp.zeros((num_class,)).at[labels].add(1.0)
    count_p = jnp.zeros((num_class,)).at[preds].add(1.0)
    union = count_t + count_p - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1e-12), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)
