"""Fused Pallas kNN kernel for TPU.

Replaces the reference's dense Gram + library top-k
(/root/reference/hpcs/nn/dgcnn/utils/vn_dgcnn_util.py:4-10) with a kernel
that tiles rows of the score matrix through VMEM and selects the k nearest
in-register, so the [N, N] matrix never reaches HBM — the XLA path writes
B*N^2 fp32 scores to HBM and reads them back through a sort; for N = 4096
that is ~0.5 GB of round-trip traffic per batch this kernel avoids.

Design notes:
- ranking key: 2 * x_i . x_j - |x_j|^2 (the row's own -|x_i|^2 is constant
  per row and cannot change the ordering, so it is dropped);
- scores for a [TN, N] row tile come from one MXU matmul in fp32;
- exact top-k via k unrolled argmax passes (k is small: 10-40).  Ties pick
  the smallest index, matching jax.lax.top_k / torch.topk;
- the kernel runs per (batch, row-tile) grid cell; neighbor gather stays in
  XLA (it fuses with the downstream concat).
"""
import functools

import jax
import jax.numpy as jnp

from ..knn import knn as knn_xla

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_NEG_INF = -3.4e38  # python float: jnp scalars would be captured tracers


def _knn_kernel(x_rows_ref, x_all_ref, idx_ref, *, k):
    x_rows = x_rows_ref[0]  # [TN, D]
    x_all = x_all_ref[0]  # [N, D]
    n = x_all.shape[0]
    tn = x_rows.shape[0]

    col_sq = jnp.sum(x_all * x_all, axis=-1)[None, :]  # [1, N]
    scores = (
        2.0
        * jax.lax.dot_general(
            x_rows, x_all,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        - col_sq
    )  # [TN, N]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, n), dimension=1)
    for j in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)  # [TN, 1]
        hit = scores == m
        amax = jnp.min(jnp.where(hit, col_ids, n), axis=1)  # smallest tied idx
        idx_ref[0, :, j] = amax
        scores = jnp.where(col_ids == amax[:, None], _NEG_INF, scores)


def _pick_row_tile(n):
    for tn in (256, 128, 64, 32, 16, 8):
        if n % tn == 0:
            return tn
    return None


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(x, k, interpret=False):
    """Indices [B, N, k] of the k nearest neighbors (self included).

    x: [B, N, D] fp32.  Falls back to the XLA path when shapes do not tile
    or Pallas is unavailable.
    """
    B, N, D = x.shape
    tn = _pick_row_tile(N)
    if not HAVE_PALLAS or tn is None or k > N:
        return knn_xla(x, k)

    # indices are piecewise-constant in x: no gradient flows through the
    # graph topology (matches torch.topk indices), and pallas_call has no
    # autodiff rule anyway.
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    kernel = functools.partial(_knn_kernel, k=k)
    grid = (B, N // tn)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        interpret=interpret,
    )(x, x)
    return out
